"""JSONL / CSV ingestion with corrupt-record isolation.

The reference ingests opaque blobs (``BlobStorageService.cs``); a
training-data pipeline's interchange formats are JSONL (the de-facto LLM
corpus format) and CSV. Both readers here enforce an EXPLICIT schema —
schema inference is a second full pass over 100 TB and silently drifts
between runs — and isolate malformed rows instead of failing the job or
silently dropping them, mirroring the extraction stage's per-row error
isolation: good rows flow, bad rows land in a quarantine DataFrame with
the raw line preserved for forensics.

Scale notes: both readers are plain distributed file scans (splittable;
one task per input split). PERMISSIVE mode evaluates per-row, so a
single bad line never kills a 10⁹-row ingest; the quarantine filter is a
map-only predicate. Writers are idempotent overwrites (the catalog's
blob-overwrite analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_jsonl", "read_csv", "write_jsonl", "split_quarantine"]

#: column where PERMISSIVE mode lands the raw text of malformed rows
CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read newline-delimited JSON under an explicit schema.

    Malformed lines (bad JSON, wrong types) produce a row whose data
    columns are NULL and whose ``_corrupt_record`` holds the raw line;
    well-formed rows carry a NULL ``_corrupt_record``. Split with
    :func:`split_quarantine`.
    """
    full = f"{schema}, {CORRUPT_COL} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV twin of :func:`read_jsonl` — explicit schema, PERMISSIVE
    corrupt-row quarantine, header handling."""
    full = f"{schema}, {CORRUPT_COL} string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantined_raw_lines).

    Spark refuses to project ONLY the corrupt column straight off a raw
    file scan (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``
    — the scan would have nothing to parse); the documented fix is to
    materialize the parsed batch first, so the reader output is cached
    here. That bounds memory by the INGEST BATCH, which is how a 100 TB
    ingest runs anyway (per-partition/per-day batches through the
    idempotent catalog sink, never one monolithic read). The cache is
    marked on the DataFrame the caller passed in, so the caller releases
    it by calling ``unpersist()`` on that same reader DataFrame once both
    sides are written (unpersisting the returned ``good``/``bad`` views
    would be a no-op — they are derived plans, not the cached one).
    """
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str) -> None:
    """Idempotent JSONL write (overwrite semantics — the catalog's blob
    ``overwrite:true`` analog)."""
    df.write.mode("overwrite").json(path)
