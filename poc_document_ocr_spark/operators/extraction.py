"""The extraction operator: Arrow-batched pandas UDF over the ``text`` column.

Rebuild of the reference's per-page OCR stage (the single expensive hop,
``DocumentIntelligenceService.cs:72-201`` called from the per-page loop at
``PdfProcessorFunction.cs:292-356``), as one vectorized UDF stage:

* JVM → Python transfer is Arrow-batched (``spark.sql.execution.arrow.*``);
  the per-element Python work is the parser itself (like any tokenizer).
* The UDF sees ONLY the ``text`` column — column pruning keeps the scan
  narrow (the reference analog: only selected pages' streams reach OCR).
* Filters (turn selection, conv filters) must be applied BEFORE this stage;
  Python UDFs are plan barriers, Catalyst will not push predicates through
  them (SURVEY.md §7.4 trap 5).

Scale notes (100 TB): extraction is turn-local, so the stage runs under
whatever partitioning the scan produced — no shuffle is introduced here.
Long conversations (skew) are safe: we do NOT group by conv_id before
extraction; regrouping happens later in the cheap fold stage with AQE skew
handling (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import dispatch
from ..schema import EXTRACTION_DDL, EXTRACTION_TYPE

__all__ = [
    "extraction_col",
    "extract_turns",
    "extract_turns_compact",
    "salted_repartition",
]


def salted_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Salted-hash repartition on (conv_id, turn_idx) ahead of the UDF stage.

    A SKEW/packing remedy, not a default: it inserts a full shuffle of the
    corpus before the map stage, and measured at 4 separate executor JVMs
    that shuffle DOUBLED extraction time (24.5s vs 12.3s at sf0.1) — in
    multi-process topologies shuffle blocks cross process/disk boundaries.
    The default extraction path instead runs under the scan's own
    partitioning and gets its parallelism from input splits
    (``spark.sql.files.maxPartitionBytes`` vs file sizes). Reach for the
    salt only when the layout defeats that: pathological file-packing
    (thousands of tiny files → a handful of splits) or an input where one
    split holds a disproportionate share of the *bytes-per-turn* cost.
    Extraction is turn-local, so the salt may include ``turn_idx`` — a
    million-turn conversation spreads across all partitions.
    Default width: 4× the cluster's default parallelism.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 4
    return df.repartition(
        num_partitions, F.xxhash64(F.col("conv_id"), F.col("turn_idx"))
    )


@F.pandas_udf(EXTRACTION_TYPE)
def _extract_udf(text: pd.Series) -> pd.DataFrame:
    rows = [dispatch.extract(t) for t in text]
    return pd.DataFrame(
        {
            "extracted_text": [r[0] for r in rows],
            "spans": [
                [{"start": s, "end": e} for (s, e) in r[1]] for r in rows
            ],
            "rule": [r[2] for r in rows],
            "fmt": [r[3] for r in rows],
        }
    )


def extraction_col(text_col: str = "text") -> Column:
    """The extraction struct column expression."""
    return _extract_udf(F.col(text_col))


def extract_turns_compact(
    df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    text_col: str = "text",
) -> DataFrame:
    """mapInPandas extraction returning ONLY keys + extraction columns.

    The fast path when downstream does not need the original payload
    columns (the consolidation fold reads just ``extracted_text``): one
    Arrow batch in (keys + text), one flat batch out — no struct column
    assembly/disassembly. Measured at local[32], sf0.1: ~1.6× the
    pandas-udf struct path (15.7s vs 24.8s median). Use
    :func:`extract_turns` when the full input row must pass through.
    """
    import pandas as pd  # local import: executors resolve lazily

    from ..functions import dispatch as _dispatch

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    ) + ", " + EXTRACTION_DDL

    def gen(batches):
        for pdf in batches:
            rows = [_dispatch.extract(t) for t in pdf[text_col]]
            out = {k: pdf[k].values for k in keys}
            out["extracted_text"] = [r[0] for r in rows]
            out["spans"] = [
                [{"start": s, "end": e} for (s, e) in r[1]] for r in rows
            ]
            out["rule"] = [r[2] for r in rows]
            out["fmt"] = [r[3] for r in rows]
            yield pd.DataFrame(out)

    return df.select(*keys, text_col).mapInPandas(gen, schema)


def extract_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append extraction output columns to a transcripts DataFrame.

    Output adds: ``extracted_text``, ``spans``, ``rule``, ``fmt``.
    """
    with_struct = df.withColumn("_ex", extraction_col(text_col))
    return (
        with_struct.withColumn("extracted_text", F.col("_ex.extracted_text"))
        .withColumn("spans", F.col("_ex.spans"))
        .withColumn("rule", F.col("_ex.rule"))
        .withColumn("fmt", F.col("_ex.fmt"))
        .drop("_ex")
    )
