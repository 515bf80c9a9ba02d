"""Derived transcripts: a deterministic transcript table built FROM the
driver's ``documents`` parquet with dialect-neutral SQL.

Why: the driver's correctness gate runs each Spark query side-by-side with an
ANSI-SQL oracle in DuckDB over the same parquet tables. The north-rule input
is a transcripts table ``(conv_id, turn_idx, role, text, tool, ts)`` that the
testdata set does not ship — so we *derive* one, deterministically, from
``documents`` using only SQL that parses identically in Spark SQL and DuckDB.
Both engines construct byte-identical inputs, making even the pandas-UDF
extraction stage oracle-checkable (the construction templates have closed-form
expected extractions).

Field lines (``identifier: TK-3-0 [0.91]`` …) are appended on modular
``doc_id`` conditions so the fold layer has deterministic work whose expected
output the oracle can compute directly from ``doc_id`` — no regex needed on
the oracle side.

Reference analog: the synthetic per-page OCR payloads the reference's unit
tests feed the aggregator/mapper (``DocumentSchemaMapperServiceTests.cs``),
here expressed as one SELECT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["N_CONV", "TRANSCRIPTS_SQL", "load_views", "spark_transcripts"]

#: conversations in the derived table: conv_id = 'c' || (doc_id % N_CONV)
N_CONV = 40

#: identifier value advances every RUN_LEN turns within a conversation →
#: several forward-fill runs per conversation
RUN_LEN = 5

_MONTH_CASE = (
    "CASE doc_id % 12 WHEN 0 THEN 'JAN' WHEN 1 THEN 'FEB' WHEN 2 THEN 'MAR' "
    "WHEN 3 THEN 'APR' WHEN 4 THEN 'MAY' WHEN 5 THEN 'JUN' WHEN 6 THEN 'JUL' "
    "WHEN 7 THEN 'AUG' WHEN 8 THEN 'SEP' WHEN 9 THEN 'OCT' WHEN 10 THEN 'NOV' "
    "ELSE 'DEC' END"
)

# Dialect-neutral (Spark SQL == DuckDB) derived-transcripts SELECT.
# {documents} is replaced with the source relation name.
TRANSCRIPTS_SQL = f"""
SELECT
  doc_id,
  'c' || CAST(doc_id % {N_CONV} AS STRING) AS conv_id,
  CAST(floor(doc_id / {N_CONV}.0) AS INT) + 1 AS turn_idx,
  CASE doc_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'system' ELSE 'tool' END AS role,
  text
    || CASE WHEN doc_id % 3 = 1 THEN chr(10) || 'identifier: TK-'
         || CAST(doc_id % {N_CONV} AS STRING) || '-'
         || CAST(CAST(floor(floor(doc_id / {N_CONV}.0) / {RUN_LEN}.0) AS INT) AS STRING)
         || ' [0.9' || CAST(doc_id % 10 AS STRING) || ']' ELSE '' END
    || CASE WHEN doc_id % 4 = 1 THEN chr(10) || 'firstName: Name'
         || CAST(doc_id % 23 AS STRING)
         || ' [0.' || CAST(50 + doc_id % 49 AS STRING) || ']' ELSE '' END
    || CASE WHEN doc_id % 5 = 2 THEN chr(10) || 'courtDate: '
         || CAST(1980 + doc_id % 30 AS STRING) || {_MONTH_CASE}
         || CAST(1 + doc_id % 28 AS STRING) ELSE '' END
    || CASE WHEN doc_id % 6 = 3 THEN chr(10) || 'mainCharge: charge item '
         || CAST(doc_id % 9 AS STRING)
         || ' [0.' || CAST(60 + doc_id % 39 AS STRING) || ']' ELSE '' END
    || CASE WHEN doc_id % 6 = 5 THEN chr(10) || 'additionalCharges: extra charge '
         || CAST(doc_id % 7 AS STRING)
         || ' [0.' || CAST(55 + doc_id % 40 AS STRING) || ']' ELSE '' END
    || CASE WHEN doc_id % 7 = 4 THEN chr(10)
         || 'defendantSignature: present [0.88]' ELSE '' END
    || CASE WHEN doc_id % 11 = 6 THEN chr(10)
         || 'officerSignature: unsigned [0.70]' ELSE '' END
    || CASE WHEN doc_id % 8 = 5 THEN chr(10) || 'phoneNumber: 555-01'
         || lpad(CAST(doc_id % 100 AS STRING), 2, '0')
         || ' [0.9' || CAST(doc_id % 9 AS STRING) || ']' ELSE '' END
    || CASE WHEN doc_id % 9 = 7 THEN chr(10) || 'notes: reviewed by clerk [0.'
         || CAST(40 + doc_id % 60 AS STRING) || ']' ELSE '' END
    AS text,
  CASE WHEN doc_id % 4 = 3 THEN 'search' END AS tool
FROM {{documents}}
"""


def load_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    """Register sf_dir parquet tables as temp views (driver-parity naming)."""
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def spark_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived transcripts DataFrame (+ ``ts``, driver-side epoch math).

    ``ts`` is appended outside the shared SQL (interval syntax differs across
    dialects); the oracle never projects it.
    """
    load_views(spark, sf_dir, "documents")
    df = spark.sql(TRANSCRIPTS_SQL.format(documents="documents"))
    return df.withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") * 60 + 1704067200)
    )


def oracle_cte(body_sql: str) -> str:
    """Wrap an oracle query body with the shared transcripts CTE ``t``."""
    t = TRANSCRIPTS_SQL.format(documents="documents")
    return f"WITH t AS ({t})\n{body_sql}"
