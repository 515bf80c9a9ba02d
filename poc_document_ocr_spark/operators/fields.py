"""Per-turn field extraction: extracted text → long-format field contributions.

Reference analog: the typed field dictionary the OCR service emits per page
(``DocumentIntelligenceService.cs:108-183``, keys ``valueString``/``content``/
``confidence``/...). In the transcript rebuild, fields appear in extracted
main content as ``key: value [confidence]`` lines, e.g.::

    identifier: TK-4711 [0.93]
    courtDate: 1985JAN12 [0.88]
    mainCharge: Speeding 42 in a 25

The extractor is pure column expressions (split → explode → regexp): it stays
inside whole-stage codegen, introduces no shuffle, and Catalyst prunes it to
the two columns it reads.

Also implements the identifier-extraction predicate (reference
``TryExtractIdentifier``, ``DocumentAggregatorService.cs:78-100``):
``coalesce(nullif(trim(value_string),''), nullif(trim(content),''))`` —
transposed here to the extracted field value, whitespace-only → null.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import FIELD_NAMES, IDENTIFIER_FIELD

__all__ = ["extract_field_contributions", "with_extracted_identifier"]

#: ``key: value [0.93]`` — confidence suffix optional; value may be empty.
_FIELD_LINE_PAT = r"^([A-Za-z][A-Za-z0-9_]*)\s*:\s*(.*?)\s*(?:\[(0(?:\.\d+)?|1(?:\.0+)?)\])?\s*$"


def extract_field_contributions(
    df: DataFrame,
    text_col: str = "extracted_text",
    keep_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """One output row per (turn, recognized field line).

    Output columns: ``*keep_cols, field, raw_value, confidence``.
    Rows where both raw_value and confidence would be null are dropped
    (reference ``CollectContributions`` skip,
    ``DocumentSchemaMapperService.cs:150-153``).
    """
    lines = df.select(
        *keep_cols,
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "_line"
        ),
    )
    key = F.regexp_extract("_line", _FIELD_LINE_PAT, 1)
    val = F.regexp_extract("_line", _FIELD_LINE_PAT, 2)
    conf = F.regexp_extract("_line", _FIELD_LINE_PAT, 3)
    out = (
        lines.withColumn("field", key)
        .filter(F.col("field").isin(*FIELD_NAMES))
        .withColumn("raw_value", F.nullif(val, F.lit("")))
        .withColumn("confidence", F.nullif(conf, F.lit("")).cast("double"))
        .drop("_line")
    )
    return out.filter(
        F.col("raw_value").isNotNull() | F.col("confidence").isNotNull()
    )


def _identifier_predicate(value: Column) -> Column:
    """Non-whitespace value or null (TryExtractIdentifier parity)."""
    return F.nullif(F.trim(F.coalesce(value, F.lit(""))), F.lit(""))


def with_extracted_identifier(
    turns: DataFrame,
    contribs: DataFrame,
    id_field: str = IDENTIFIER_FIELD,
) -> DataFrame:
    """Join per-turn identifier contributions back onto the turns table.

    Adds ``extracted_id`` (null when the turn extracted no identifier).
    If a turn somehow carries several identifier lines, the highest
    confidence (tie → first occurrence keeps min value) wins deterministically.
    """
    ids = (
        contribs.filter(F.col("field") == id_field)
        .withColumn("extracted_id", _identifier_predicate(F.col("raw_value")))
        .filter(F.col("extracted_id").isNotNull())
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                "extracted_id",
                F.struct(
                    F.coalesce(F.col("confidence"), F.lit(float("-inf"))).alias(
                        "c"
                    ),
                    F.col("extracted_id").alias("v"),
                ),
            ).alias("extracted_id")
        )
    )
    return turns.join(ids, ["conv_id", "turn_idx"], "left")
