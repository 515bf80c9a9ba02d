"""Driver-contract queries + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 is exposed here as a named query
(``QUERIES[name](spark, sf_dir) -> DataFrame``) with a matching ANSI-SQL
oracle (``ORACLES[name]``) that DuckDB runs over the same parquet tables.

Oracle strategy: the north-rule input (a transcripts table) is *derived*
from the testdata ``documents`` table with dialect-neutral SQL shared
verbatim by both engines (``sources/derive.py``), so inputs are
byte-identical. The extraction pandas UDF is oracle-checked through
construction templates with closed-form expected output (plain → identity;
HTML wrap → the article inner text at a constant offset; two-page layout →
header/footer-stripped page bodies). The fold/window layer is re-implemented
independently in portable SQL on the oracle side.

All aliases are lowercase in both engines (the driver hash sorts columns by
name). No floating-point sums cross engines — only min/max/count and
division of identical integers/parsed literals (IEEE-identical).

Cross-engine dialect hazards — a checklist for new query authors, from the
three bugs actually hit in round 4 (VERDICT r4 task #9):

1. **Quantize thresholds so the widest intermediate fits int128.** DuckDB's
   HUGEINT caps at 2¹²⁷; a ppm-quantized squared-cosine predicate overflows
   at ``(Σ64·(4·10⁶)²)²·10¹² ≈ 6.5·10⁴⁰``. Work the bound BEFORE picking the
   resolution (the similarity predicate uses ppk — ``dot²·10⁶ ≤ 1.1·10³⁶``
   — and documents the margin). Spark DECIMAL(38,0) has the same ceiling.
2. **Only sqrt is IEEE-exact among float math.** Cross-engine float may
   agree for ``sqrt`` of an identical double (correctly-rounded in both),
   but NOT for ``pow``/``ln``/``exp`` or any accumulation order the engines
   sequence differently. The HLL alpha constant is therefore expressed as a
   rational plus sqrt-only arithmetic; never let a transcendental or a
   float SUM cross the engine boundary.
3. **Count characters with translate()-style deletion, not regex.** Two
   char-class regex passes over the same text in one task measured ≈25×
   slower than ``translate`` deletion + length difference, and regex
   class semantics differ subtly between engines (POSIX classes vs Java);
   ``translate`` has identical literal semantics in both. The same applies
   to counting: ``length(x) - length(translate(x, chars, ''))``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.selection import TurnSelection
from .operators.aggregation import parse_ocr_date, with_local_index, with_runs
from .operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
    word_shingles,
)
from .operators.extraction import extract_turns
from .operators.fields import (
    extract_field_contributions,
    with_extracted_identifier,
)
from .operators.similarity import cosine_topk
from .operators.textstats import fingerprint, lang_id, token_stats
from .plans.pipeline import consolidate_stage
from .sources.derive import (
    N_CONV,
    RUN_LEN,
    TRANSCRIPTS_SQL,
    load_views,
    oracle_cte,
    spark_transcripts,
)

__all__ = ["QUERIES", "ORACLES", "entry"]

# ---------------------------------------------------------------------------
# Shared construction templates (constants on both sides)
# ---------------------------------------------------------------------------

_HTML_PRE = (
    "<html><head><title>doc</title></head><body>"
    "<nav><a href='/'>Home</a> <a href='/x'>Search</a> <a href='/y'>Login</a></nav>"
    "<article><p>"
)
_HTML_SUF = "</p></article><footer>footer text copy 2024</footer></body></html>"

_LAY_HDR = "CASE TRANSCRIPT\n"
_LAY_P2 = "closing remarks and final disposition of the case"
_LAY_MID = "\nPage 1 of 2\x0c" + _LAY_HDR
_LAY_SUF = "\nPage 2 of 2"

# span arithmetic constants (codepoint offsets into the constructed text)
_H_OFF = len(_HTML_PRE)  # html article content start
_L_S0 = len(_LAY_HDR)  # layout page-1 content start
_L_GAP = len(_LAY_MID)  # between page-1 end and page-2 start
_L_P2LEN = len(_LAY_P2)

_MON3 = "('JAN','FEB','MAR','APR','MAY','JUN','JUL','AUG','SEP','OCT','NOV','DEC')"
_MONFULL = (
    "('JANUARY','FEBRUARY','MARCH','APRIL','MAY','JUNE','JULY','AUGUST',"
    "'SEPTEMBER','OCTOBER','NOVEMBER','DECEMBER')"
)


def _mon_case(expr: str, names: str) -> str:
    """Dialect-neutral month-name CASE over a 1-based month expression."""
    parts = [
        f"WHEN {i + 1} THEN '{n}'"
        for i, n in enumerate(names.strip("()").replace("'", "").split(","))
    ]
    return f"CASE CAST({expr} AS INT) " + " ".join(parts) + " END"


# Dialect-neutral raw-date construction over orders (both engines run this).
_DATE_RAW_SQL = f"""
SELECT o_orderkey,
  CASE CAST(o_orderkey % 4 AS INT)
    WHEN 0 THEN CAST(year(o_orderdate) AS STRING)
         || {_mon_case("month(o_orderdate)", _MON3)}
         || CAST(day(o_orderdate) AS STRING)
    WHEN 1 THEN CAST(day(o_orderdate) AS STRING) || 'TH DAY OF '
         || {_mon_case("month(o_orderdate)", _MONFULL)}
         || ', ' || CAST(year(o_orderdate) AS STRING)
    WHEN 2 THEN 'not a date'
    ELSE CAST(year(o_orderdate) AS STRING) || '-'
         || lpad(CAST(month(o_orderdate) AS STRING), 2, '0') || '-'
         || lpad(CAST(day(o_orderdate) AS STRING), 2, '0')
  END AS raw
FROM orders
"""

# Oracle-side contributions CTE: what the field-line regex must recover,
# constructed directly from doc_id (no regex on the oracle side).
_C_SQL = f"""
  SELECT conv_id, turn_idx, 'identifier' AS field,
         'TK-' || CAST(doc_id % {N_CONV} AS STRING) || '-'
           || CAST(CAST(floor(floor(doc_id / {N_CONV}.0) / {RUN_LEN}.0) AS INT) AS STRING) AS raw_value,
         CAST('0.9' || CAST(doc_id % 10 AS STRING) AS DOUBLE) AS confidence,
         CAST(NULL AS STRING) AS date_iso
  FROM t WHERE doc_id % 3 = 1
  UNION ALL
  SELECT conv_id, turn_idx, 'firstName',
         'Name' || CAST(doc_id % 23 AS STRING),
         CAST('0.' || CAST(50 + doc_id % 49 AS STRING) AS DOUBLE), NULL
  FROM t WHERE doc_id % 4 = 1
  UNION ALL
  SELECT conv_id, turn_idx, 'courtDate',
         CAST(1980 + doc_id % 30 AS STRING)
           || {_mon_case("doc_id % 12 + 1", _MON3)}
           || CAST(1 + doc_id % 28 AS STRING),
         CAST(NULL AS DOUBLE),
         printf('%04d-%02d-%02d', CAST(1980 + doc_id % 30 AS INT),
                CAST(doc_id % 12 AS INT) + 1, CAST(1 + doc_id % 28 AS INT))
  FROM t WHERE doc_id % 5 = 2
  UNION ALL
  SELECT conv_id, turn_idx, 'mainCharge',
         'charge item ' || CAST(doc_id % 9 AS STRING),
         CAST('0.' || CAST(60 + doc_id % 39 AS STRING) AS DOUBLE), NULL
  FROM t WHERE doc_id % 6 = 3
  UNION ALL
  SELECT conv_id, turn_idx, 'additionalCharges',
         'extra charge ' || CAST(doc_id % 7 AS STRING),
         CAST('0.' || CAST(55 + doc_id % 40 AS STRING) AS DOUBLE), NULL
  FROM t WHERE doc_id % 6 = 5
  UNION ALL
  SELECT conv_id, turn_idx, 'defendantSignature', 'present',
         CAST('0.88' AS DOUBLE), NULL
  FROM t WHERE doc_id % 7 = 4
  UNION ALL
  SELECT conv_id, turn_idx, 'officerSignature', 'unsigned',
         CAST('0.70' AS DOUBLE), NULL
  FROM t WHERE doc_id % 11 = 6
  UNION ALL
  SELECT conv_id, turn_idx, 'phoneNumber',
         '555-01' || lpad(CAST(doc_id % 100 AS STRING), 2, '0'),
         CAST('0.9' || CAST(doc_id % 9 AS STRING) AS DOUBLE), NULL
  FROM t WHERE doc_id % 8 = 5
  UNION ALL
  SELECT conv_id, turn_idx, 'notes', 'reviewed by clerk',
         CAST('0.' || CAST(40 + doc_id % 60 AS STRING) AS DOUBLE), NULL
  FROM t WHERE doc_id % 9 = 7
"""

# Oracle-side forward-fill runs chain over t (DuckDB windows).
_RUNS_SQL = f"""
c AS ({_C_SQL}),
ids AS (SELECT conv_id, turn_idx, raw_value AS extracted_id
        FROM c WHERE field = 'identifier'),
tt AS (SELECT t.conv_id, t.turn_idx, ids.extracted_id
       FROM t LEFT JOIN ids
         ON t.conv_id = ids.conv_id AND t.turn_idx = ids.turn_idx),
ff AS (SELECT conv_id, turn_idx, extracted_id,
         last_value(extracted_id IGNORE NULLS) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS UNBOUNDED PRECEDING) AS ffill_id
       FROM tt),
lg AS (SELECT *, lag(ffill_id) OVER
         (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ffill FROM ff),
runs AS (SELECT conv_id, turn_idx, extracted_id, ffill_id,
           CAST(sum(CASE WHEN extracted_id IS NOT NULL
                          AND (prev_ffill IS NULL OR extracted_id <> prev_ffill)
                     THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING) AS INT) AS run_id,
           CASE WHEN extracted_id IS NOT NULL THEN 'Extracted'
                ELSE 'Inferred' END AS id_source
         FROM lg)
"""

# Shared dup-corpus constructions (dialect-neutral).
_CORPUS_EXACT = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 < 3
"""
_CORPUS_NEAR = """
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra trailing token' AS text
  FROM documents WHERE doc_id < 200 AND doc_id % 5 < 2
"""
_NEAR_PAIRS = """
  SELECT doc_id AS id_a, doc_id + 100000 AS id_b
  FROM documents WHERE doc_id < 200 AND doc_id % 5 < 2
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "documents")
    return spark.table("documents")


def _sql_over(spark: SparkSession, sf_dir: str, sql: str,
              *tables: str) -> DataFrame:
    load_views(spark, sf_dir, *tables)
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# North-rule queries: extraction
# ---------------------------------------------------------------------------


def q_extract_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn extraction over the derived transcripts (plain payloads)."""
    ex = extract_turns(spark_transcripts(spark, sf_dir))
    return ex.select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        "rule",
        "fmt",
        F.size("spans").cast("long").alias("n_spans"),
        F.col("spans")[0]["start"].cast("long").alias("span_start"),
        F.col("spans")[0]["end"].cast("long").alias("span_end"),
    )


_O_EXTRACT_PLAIN = oracle_cte(
    """
SELECT conv_id, turn_idx, text AS extracted_text,
       'plain' AS rule, 'plain' AS fmt,
       CAST(1 AS BIGINT) AS n_spans, CAST(0 AS BIGINT) AS span_start,
       CAST(length(text) AS BIGINT) AS span_end
FROM t
"""
)


def q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip: nav/footer dropped, article content kept,
    spans point into the original markup at a computable offset."""
    docs = _docs(spark, sf_dir)
    wrapped = docs.select(
        "doc_id",
        F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_SUF)).alias(
            "text"
        ),
    )
    ex = extract_turns(wrapped)
    return ex.select(
        "doc_id",
        "extracted_text",
        "rule",
        "fmt",
        F.size("spans").cast("long").alias("n_spans"),
        F.col("spans")[0]["start"].cast("long").alias("span_start"),
        F.col("spans")[0]["end"].cast("long").alias("span_end"),
    )


_O_EXTRACT_HTML = f"""
SELECT doc_id, text AS extracted_text, 'article' AS rule, 'html' AS fmt,
       CAST(1 AS BIGINT) AS n_spans,
       CAST({_H_OFF} AS BIGINT) AS span_start,
       CAST({_H_OFF} + length(text) AS BIGINT) AS span_end
FROM documents
"""


#: markdown envelope for the oracle-checked md engine query: heading +
#: fenced tool dump + blockquoted corpus text + bullet + link line. Every
#: piece's extraction is analytically computable, so the DuckDB twin can
#: predict text AND span offsets exactly.
_MD_PRE = "# Transcript Note\n\n```\nraw tool dump line\n```\n\n> "
_MD_SUF = "\n\n- first follow-up\n\nsee [the source](http://src) for more\n"


def q_extract_md(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown main-content extraction: heading marker stripped, fenced
    code dropped, blockquote/bullet markers stripped, link unwrapped to
    its text — spans point into the original markup at computable
    offsets (the md sibling of extract_html / extract_layout)."""
    docs = _docs(spark, sf_dir)
    wrapped = docs.select(
        "doc_id",
        F.concat(F.lit(_MD_PRE), F.col("text"), F.lit(_MD_SUF)).alias(
            "text"
        ),
    )
    ex = extract_turns(wrapped)
    return ex.select(
        "doc_id",
        "extracted_text",
        "rule",
        "fmt",
        F.size("spans").cast("long").alias("n_spans"),
        F.col("spans")[0]["start"].cast("long").alias("s0_start"),
        F.col("spans")[0]["end"].cast("long").alias("s0_end"),
        F.col("spans")[1]["start"].cast("long").alias("body_start"),
        F.col("spans")[1]["end"].cast("long").alias("body_end"),
        F.element_at("spans", -1)["start"].cast("long").alias("last_start"),
        F.element_at("spans", -1)["end"].cast("long").alias("last_end"),
    )


def _o_extract_md() -> str:
    pre_len = len(_MD_PRE)
    # suffix-relative offsets of the last span (" for more" after the link)
    tail = _MD_SUF
    last_rel = tail.index(") for more") + 1  # first char of " for more"
    last_len = len(" for more")
    return f"""
SELECT doc_id,
  'Transcript Note' || chr(10) || text || chr(10) ||
    'first follow-up' || chr(10) || 'see the source for more'
    AS extracted_text,
  'md_prose' AS rule, 'md' AS fmt,
  CAST(6 AS BIGINT) AS n_spans,
  CAST(2 AS BIGINT) AS s0_start, CAST(17 AS BIGINT) AS s0_end,
  CAST({pre_len} AS BIGINT) AS body_start,
  CAST({pre_len} + length(text) AS BIGINT) AS body_end,
  CAST({pre_len} + length(text) + {last_rel} AS BIGINT) AS last_start,
  CAST({pre_len} + length(text) + {last_rel} + {last_len} AS BIGINT)
    AS last_end
FROM documents
"""


def q_extract_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-page PDF-layout extraction: repeated page headers and page-number
    footers stripped, page bodies joined in order, two spans."""
    docs = _docs(spark, sf_dir)
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit(_LAY_HDR),
            F.col("text"),
            F.lit(_LAY_MID),
            F.lit(_LAY_P2),
            F.lit(_LAY_SUF),
        ).alias("text"),
    )
    ex = extract_turns(wrapped)
    return ex.select(
        "doc_id",
        "extracted_text",
        "rule",
        "fmt",
        F.size("spans").cast("long").alias("n_spans"),
        F.col("spans")[0]["start"].cast("long").alias("s0_start"),
        F.col("spans")[0]["end"].cast("long").alias("s0_end"),
        F.col("spans")[1]["start"].cast("long").alias("s1_start"),
        F.col("spans")[1]["end"].cast("long").alias("s1_end"),
    )


_O_EXTRACT_LAYOUT = f"""
SELECT doc_id,
       text || chr(10) || '{_LAY_P2}' AS extracted_text,
       'layout-1col' AS rule, 'layout' AS fmt,
       CAST(2 AS BIGINT) AS n_spans,
       CAST({_L_S0} AS BIGINT) AS s0_start,
       CAST({_L_S0} + length(text) AS BIGINT) AS s0_end,
       CAST({_L_S0} + length(text) + {_L_GAP} AS BIGINT) AS s1_start,
       CAST({_L_S0} + length(text) + {_L_GAP} + {_L_P2LEN} AS BIGINT) AS s1_end
FROM documents
"""


def q_dispatch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format dispatcher over a mixed corpus: counts by (fmt, rule)."""
    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    payload = (
        F.when(d % 4 == 0, F.col("text"))
        .when(
            d % 4 == 1,
            F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_SUF)),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit(_LAY_HDR),
                F.col("text"),
                F.lit(_LAY_MID),
                F.lit(_LAY_P2),
                F.lit(_LAY_SUF),
            ),
        )
        .otherwise(F.lit(""))
    )
    ex = extract_turns(docs.select("doc_id", payload.alias("text")))
    return ex.groupBy("fmt", "rule").agg(F.count(F.lit(1)).alias("n"))


_O_DISPATCH_MIX = """
SELECT CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'plain' WHEN 1 THEN 'html'
            WHEN 2 THEN 'layout' ELSE 'empty' END AS fmt,
       CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'plain' WHEN 1 THEN 'article'
            WHEN 2 THEN 'layout-1col' ELSE 'empty' END AS rule,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# North-rule queries: field contributions, runs, consolidation
# ---------------------------------------------------------------------------


def q_field_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extracted text → long-format (field, raw_value, confidence) rows."""
    ex = extract_turns(spark_transcripts(spark, sf_dir))
    return extract_field_contributions(ex).select(
        "conv_id", "turn_idx", "field", "raw_value", "confidence"
    )


_O_FIELD_CONTRIBS = oracle_cte(
    f"SELECT conv_id, turn_idx, field, raw_value, confidence FROM ({_C_SQL}) c"
)


def q_forward_fill_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill + gaps-and-islands run ids (the aggregation core)."""
    ex = extract_turns(spark_transcripts(spark, sf_dir))
    contribs = extract_field_contributions(ex)
    turns = with_extracted_identifier(
        ex.select("conv_id", "turn_idx"), contribs
    )
    return with_runs(turns).select(
        "conv_id", "turn_idx", "extracted_id", "ffill_id", "run_id",
        "id_source",
    )


_O_FFILL_RUNS = oracle_cte(
    f"""
, {_RUNS_SQL}
SELECT conv_id, turn_idx, extracted_id, ffill_id, run_id, id_source FROM runs
""".replace("\n, ", ",\n", 1)
)


def q_run_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-run document headers: doc_key, turn stats."""
    from .operators.aggregation import run_headers

    ex = extract_turns(spark_transcripts(spark, sf_dir))
    contribs = extract_field_contributions(ex)
    turns = with_runs(
        with_extracted_identifier(ex.select("conv_id", "turn_idx"), contribs)
    )
    hdr = run_headers(turns)
    return hdr.select(
        "conv_id",
        "run_id",
        "doc_key",
        "turn_count",
        "first_turn",
        F.array_join(
            F.transform("turn_idxs", lambda x: x.cast("string")), ","
        ).alias("turns_csv"),
    )


_O_RUN_HEADERS = oracle_cte(
    f"""
, {_RUNS_SQL}
SELECT conv_id, run_id,
  CASE WHEN min(ffill_id) IS NOT NULL AND trim(min(ffill_id)) <> ''
       THEN min(ffill_id)
       ELSE 'unknown-' || conv_id || '-' || CAST(min(turn_idx) AS STRING)
  END AS doc_key,
  CAST(count(*) AS INT) AS turn_count,
  min(turn_idx) AS first_turn,
  string_agg(CAST(turn_idx AS STRING), ',' ORDER BY turn_idx) AS turns_csv
FROM runs GROUP BY conv_id, run_id
""".replace("\n, ", ",\n", 1)
)


def q_consolidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: full pipeline (extract → contributions → runs → folds →
    all-13-keys completion), flattened to scalar columns."""
    ex = extract_turns(spark_transcripts(spark, sf_dir))
    rec = consolidate_stage(ex)
    return _flat_consolidated(rec)


def q_consolidate_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The automatic long-conversation fold guard under load: the auto
    router with threshold=3 sends nearly every document through the
    LONG-format per-field fold (streaming aggregates, no whole-document
    collect buffer) while the few light ones take the compact fold — and
    the union must still match the one consolidate oracle row-for-row.
    Proves the escape-hatch path computes the identical four merge rules,
    not an approximation of them."""
    ex = extract_turns(spark_transcripts(spark, sf_dir))
    from .operators.aggregation import consolidate_auto

    return _flat_consolidated(consolidate_auto(ex, threshold=3))


def _flat_consolidated(rec: DataFrame) -> DataFrame:
    return rec.select(
        "conv_id",
        "run_id",
        "doc_key",
        "turn_count",
        "first_turn",
        F.col("identifier.value").alias("identifier_value"),
        F.col("identifier.confidence").alias("identifier_conf"),
        F.col("firstName.value").alias("firstname_value"),
        F.col("firstName.confidence").alias("firstname_conf"),
        F.col("lastName.value").alias("lastname_value"),
        F.col("lastName.status").alias("lastname_status"),
        F.col("courtDate.value").alias("courtdate_value"),
        F.col("courtDate.raw_text").alias("courtdate_raw"),
        F.col("mainCharge.value").alias("maincharge_value"),
        F.col("mainCharge.confidence").alias("maincharge_conf"),
        F.col("additionalCharges.value").alias("addcharges_value"),
        F.col("additionalCharges.confidence").alias("addcharges_conf"),
        F.col("defendantSignature.value").alias("defsig_value"),
        F.col("defendantSignature.confidence").alias("defsig_conf"),
        F.col("officerSignature.value").alias("offsig_value"),
        F.col("officerSignature.confidence").alias("offsig_conf"),
        F.col("phoneNumber.value").alias("phone_value"),
        F.col("notes.value").alias("notes_value"),
        # contract guarantee 6 asserted on real columns: reviewed_* are null
        # at creation (SchemaField.cs:13-63)
        F.col("identifier.reviewed_value").alias("identifier_reviewed_value"),
        F.col("identifier.reviewed_by").alias("identifier_reviewed_by"),
        F.col("identifier.reviewed_at").alias("identifier_reviewed_at"),
        F.col("courtDate.reviewed_value").alias("courtdate_reviewed_value"),
        # FR-006 warn-path counter (0 across this corpus — asserted)
        F.col("sig_warnings"),
    )


_O_CONSOLIDATE = oracle_cte(
    f"""
, {_RUNS_SQL},
hdr AS (SELECT conv_id, run_id, min(ffill_id) AS ident,
          CAST(count(*) AS INT) AS turn_count, min(turn_idx) AS first_turn
        FROM runs GROUP BY conv_id, run_id),
cr AS (SELECT c.conv_id, c.turn_idx, c.field, c.raw_value, c.confidence,
              c.date_iso, runs.run_id
       FROM c JOIN runs
         ON c.conv_id = runs.conv_id AND c.turn_idx = runs.turn_idx),
rk AS (SELECT *, row_number() OVER
         (PARTITION BY conv_id, run_id, field
          ORDER BY coalesce(confidence, -1e308) DESC, turn_idx ASC) AS rn
       FROM cr),
folded AS (
  SELECT conv_id, run_id, field,
    max(CASE WHEN rn = 1 THEN raw_value END) AS best_raw,
    max(CASE WHEN rn = 1 THEN confidence END) AS best_conf,
    max(CASE WHEN rn = 1 THEN date_iso END) AS best_date,
    string_agg(raw_value, chr(10) ORDER BY turn_idx) AS concat_raw,
    min(confidence) AS conf_min,
    max(CASE WHEN lower(raw_value) IN ('signed', 'present')
        THEN 1 ELSE 0 END) AS sig_present
  FROM rk GROUP BY conv_id, run_id, field),
wide AS (
  SELECT conv_id, run_id,
    max(CASE WHEN field = 'identifier' THEN best_raw END) AS identifier_value,
    max(CASE WHEN field = 'identifier' THEN best_conf END) AS identifier_conf,
    max(CASE WHEN field = 'firstName' THEN best_raw END) AS firstname_value,
    max(CASE WHEN field = 'firstName' THEN best_conf END) AS firstname_conf,
    max(CASE WHEN field = 'courtDate' THEN best_date END) AS courtdate_value,
    max(CASE WHEN field = 'courtDate' THEN best_raw END) AS courtdate_raw,
    max(CASE WHEN field = 'mainCharge' THEN concat_raw END) AS maincharge_value,
    max(CASE WHEN field = 'mainCharge' THEN conf_min END) AS maincharge_conf,
    max(CASE WHEN field = 'additionalCharges' THEN concat_raw END) AS addcharges_value,
    max(CASE WHEN field = 'additionalCharges' THEN conf_min END) AS addcharges_conf,
    max(CASE WHEN field = 'defendantSignature'
        THEN CASE WHEN sig_present = 1 THEN 'true' ELSE 'false' END END) AS defsig_value,
    max(CASE WHEN field = 'defendantSignature' THEN conf_min END) AS defsig_conf,
    max(CASE WHEN field = 'officerSignature'
        THEN CASE WHEN sig_present = 1 THEN 'true' ELSE 'false' END END) AS offsig_value,
    max(CASE WHEN field = 'officerSignature' THEN conf_min END) AS offsig_conf,
    max(CASE WHEN field = 'phoneNumber' THEN best_raw END) AS phone_value,
    max(CASE WHEN field = 'notes' THEN best_raw END) AS notes_value
  FROM folded GROUP BY conv_id, run_id)
SELECT h.conv_id, h.run_id,
  CASE WHEN h.ident IS NOT NULL AND trim(h.ident) <> '' THEN h.ident
       ELSE 'unknown-' || h.conv_id || '-' || CAST(h.first_turn AS STRING)
  END AS doc_key,
  h.turn_count, h.first_turn,
  w.identifier_value, w.identifier_conf,
  w.firstname_value, w.firstname_conf,
  CAST(NULL AS STRING) AS lastname_value, 'Pending' AS lastname_status,
  w.courtdate_value, w.courtdate_raw,
  w.maincharge_value, w.maincharge_conf,
  w.addcharges_value, w.addcharges_conf,
  w.defsig_value, w.defsig_conf,
  w.offsig_value, w.offsig_conf,
  w.phone_value, w.notes_value,
  CAST(NULL AS STRING) AS identifier_reviewed_value,
  CAST(NULL AS STRING) AS identifier_reviewed_by,
  CAST(NULL AS TIMESTAMP) AS identifier_reviewed_at,
  CAST(NULL AS STRING) AS courtdate_reviewed_value,
  CAST(0 AS INT) AS sig_warnings
FROM hdr h LEFT JOIN wide w
  ON h.conv_id = w.conv_id AND h.run_id = w.run_id
""".replace("\n, ", ",\n", 1)
)


# ---------------------------------------------------------------------------
# Serving-layer queries: review state machine, projections, listings
# ---------------------------------------------------------------------------

#: shared pinned review-session constants (both engines)
_AS_OF = "2026-01-01"
_CAROL, _ALICE, _BOB, _EVE = (
    "carol@example.com",
    "alice@example.com",
    "bob@example.com",
    "eve@example.com",
)


def q_streaming_consolidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental consolidation as streaming view maintenance, oracle-
    checked against the FULL batch consolidate: the derived transcripts
    arrive as two files with every conversation split across them (odd/even
    doc_id halves), ``maxFilesPerTrigger=1`` forces one micro-batch per
    file, and each batch re-folds only the conv-buckets it touched over
    their complete accumulated history. The drained records table must
    equal the one-shot batch fold row-for-row — partial per-batch documents
    from batch 1 must have been REPLACED, not appended to, by batch 2's
    re-fold."""
    import os
    import tempfile

    from .sources.catalog import Catalog
    from .streaming.ingest import stream_consolidate_to_catalog

    t = spark_transcripts(spark, sf_dir)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    d = tempfile.mkdtemp(prefix="sg_stream_consol_")
    src = os.path.join(d, "in")
    # every conversation has turns in BOTH waves (doc_id parity interleaves
    # turn_idx within each conv), so batch 1 folds partial documents that
    # batch 2's bucket re-fold must replace
    for wave, pred in (("w0", F.col("doc_id") % 2 == 0),
                       ("w1", F.col("doc_id") % 2 == 1)):
        t.filter(pred).select(*cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    cat = Catalog(spark, os.path.join(d, "wh"))
    q = stream_consolidate_to_catalog(
        spark, cat, src, "extracted_stream", "records",
        os.path.join(d, "ckpt"), run_id="run-SC",
        max_files=1, buckets=8,
    )
    q.awaitTermination()
    return _flat_consolidated(cat.read("records"))


# Dialect-neutral lock/request fixture derivation (Spark SQL == DuckDB):
# 60 documents, a third of them held (half fresh, half exactly at the 24h
# stale boundary), ~8 timestamp-ordered requests per document mixing
# checkout/checkin/cancel across 4 reviewers.
_LOCKS_SQL = """
SELECT doc_key,
  CASE WHEN k % 3 = 1 THEN 'rev' || CAST(k % 4 AS STRING) END
    AS checked_out_by,
  CASE WHEN k % 3 = 1 THEN CAST(1000000 - (k % 2) * 86400 AS BIGINT) END
    AS checked_out_at,
  CAST(NULL AS STRING) AS last_checked_in_by,
  CAST(NULL AS BIGINT) AS last_checked_in_at
FROM (SELECT DISTINCT doc_id % 60 AS k,
        'dk' || CAST(doc_id % 60 AS STRING) AS doc_key FROM documents) z
"""

_LOCK_REQS_SQL = """
SELECT 'dk' || CAST(doc_id % 60 AS STRING) AS doc_key,
  CAST(doc_id AS INT) AS seq,
  'rev' || CAST(doc_id % 4 AS STRING) AS reviewer,
  CASE WHEN doc_id % 7 < 4 THEN 'checkout'
       WHEN doc_id % 7 < 6 THEN 'checkin' ELSE 'cancel' END AS action,
  CAST(1000000 + doc_id % 50 AS BIGINT) AS req_ts
FROM documents
"""


def q_lock_checkout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pessimistic lock service resolved as a batch (SURVEY row 55,
    FR-021..FR-024): per-document timestamp-ordered fold of checkout/
    checkin/cancel requests against the lock table — same decision table
    as ``DocumentLockService.cs:32-147`` (same-holder refresh, <24h deny,
    ≥24h stale release, non-holder checkin/cancel rejection, FR-024
    cancel-without-stamps), with the oracle replaying the identical
    sequential state machine as a recursive CTE."""
    from .operators.review import resolve_lock_requests

    locks = _sql_over(spark, sf_dir, _LOCKS_SQL, "documents")
    reqs = _sql_over(spark, sf_dir, _LOCK_REQS_SQL, "documents")
    return resolve_lock_requests(locks, reqs)


_O_LOCK_CHECKOUT = f"""
WITH RECURSIVE
locks AS ({_LOCKS_SQL}),
reqs0 AS ({_LOCK_REQS_SQL}),
reqs AS (SELECT *, CAST(row_number() OVER
           (PARTITION BY doc_key ORDER BY req_ts, seq, reviewer, action)
           AS INT) AS step
         FROM reqs0),
sim(doc_key, step, cob, coa, lcib, lcia, seq, reviewer, action, ts,
    granted, reason, last_ci_by, last_ci_at) AS (
  SELECT d.doc_key, 0, l.checked_out_by, l.checked_out_at,
         l.last_checked_in_by, l.last_checked_in_at,
         CAST(NULL AS INT), CAST(NULL AS STRING), CAST(NULL AS STRING),
         CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS STRING),
         CAST(NULL AS STRING), CAST(NULL AS BIGINT)
  FROM (SELECT DISTINCT doc_key FROM reqs0) d
  LEFT JOIN locks l ON l.doc_key = d.doc_key
  UNION ALL
  SELECT doc_key, step, new_cob, new_coa, new_lcib, new_lcia,
         seq, reviewer, action, ts, granted, reason, new_lcib, new_lcia
  FROM (
    SELECT x.*,
      CASE WHEN x.action = 'checkout' AND x.granted THEN x.reviewer
           WHEN x.action <> 'checkout' AND x.granted THEN NULL
           ELSE x.cob END AS new_cob,
      CASE WHEN x.action = 'checkout' AND x.granted THEN x.ts
           WHEN x.action <> 'checkout' AND x.granted THEN NULL
           ELSE x.coa END AS new_coa,
      CASE WHEN x.action = 'checkin' AND x.granted THEN x.reviewer
           ELSE x.lcib END AS new_lcib,
      CASE WHEN x.action = 'checkin' AND x.granted THEN x.ts
           ELSE x.lcia END AS new_lcia,
      CASE WHEN x.granted THEN NULL
           WHEN x.action = 'checkout' THEN 'held'
           ELSE 'held_by_other' END AS reason
    FROM (
      SELECT s.doc_key, r.step, s.cob, s.coa, s.lcib, s.lcia,
             r.seq, r.reviewer, r.action, r.req_ts AS ts,
             CASE WHEN r.action = 'checkout'
                  THEN s.cob IS NULL
                       OR coalesce(lower(s.cob) = lower(r.reviewer), false)
                       OR coalesce(r.req_ts - s.coa >= 86400, false)
                  ELSE s.cob IS NULL
                       OR coalesce(lower(s.cob) = lower(r.reviewer), false)
             END AS granted
      FROM sim s JOIN reqs r
        ON r.doc_key = s.doc_key AND r.step = s.step + 1
    ) x
  ) y
)
SELECT doc_key, seq, reviewer, action, ts AS req_ts, granted, reason,
       cob AS held_by, coa AS held_at, last_ci_by, last_ci_at
FROM sim WHERE step > 0
"""


def q_review_projections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving layer over consolidated records: a deterministic simulated
    review session (per-field Confirmed/Corrected edits incl. a rejected
    future-date correction), then the Review-page projections — fields-
    reviewed count, derived record status, confidence band, primary-turn
    anchor — and the review-list 'free' checkout filter.

    Reference: ``DocumentListFilter.cs:18-49``,
    ``DocumentReviewService.cs:70-170``, ``ReviewUiHelpers.cs:25-38,119-141``.
    """
    from .operators.review import (
        apply_field_edit,
        confidence_band,
        derived_review_status,
        fields_reviewed_count,
        filter_documents,
        primary_turn,
    )
    from .schema import DATE_FIELDS, FIELD_NAMES

    rec = consolidate_stage(extract_turns(spark_transcripts(spark, sf_dir)))
    as_of = F.lit(_AS_OF)
    now = F.to_timestamp(F.lit(f"{_AS_OF} 00:00:00"))
    # deterministic edit selector: conversation number + run id (spreads all
    # residues at every sf; pure modular arithmetic → oracle-computable)
    edited = rec.withColumn(
        "_sel", F.substring("conv_id", 2, 6).cast("int") + F.col("run_id")
    )
    sel = F.col("_sel")
    confirm_all = sel % 7 == 6
    none_str = F.lit(None).cast("string")
    for name in FIELD_NAMES:
        if name == "firstName":
            st = F.when(confirm_all | (sel % 2 == 0), F.lit("Confirmed"))
            val = none_str
            rev = F.when(confirm_all, _CAROL).otherwise(_ALICE)
        elif name == "notes":
            st = F.when(confirm_all, "Confirmed").when(
                sel % 3 == 1, "Corrected"
            )
            val = F.when(~confirm_all & (sel % 3 == 1), "corrected note")
            rev = F.when(confirm_all, _CAROL).otherwise(_BOB)
        elif name == "courtDate":
            st = F.when(confirm_all, "Confirmed").when(
                (sel % 5).isin(2, 3), F.lit("Corrected")
            )
            # %5==2 → future date, rejected by FR-002a validation; %5==3 →
            # valid leap-day correction
            val = F.when(~confirm_all & (sel % 5 == 2), "2030-01-01").when(
                ~confirm_all & (sel % 5 == 3), "2020-02-29"
            )
            rev = F.when(confirm_all, _CAROL).otherwise(_BOB)
        else:
            st = F.when(confirm_all, F.lit("Confirmed"))
            val = none_str
            rev = F.lit(_CAROL)
        edited = edited.withColumn(
            name,
            apply_field_edit(
                F.col(name), st, val, rev, now, name in DATE_FIELDS, as_of
            ),
        )

    listed = filter_documents(
        edited.withColumn(
            "checked_out_by", F.when(sel % 4 == 1, F.lit(_EVE))
        ),
        review_status=None,
        checkout="free",
    )
    return listed.select(
        "conv_id",
        "run_id",
        "doc_key",
        fields_reviewed_count().alias("fields_reviewed"),
        derived_review_status(F.lit("Pending")).alias("review_status"),
        confidence_band(F.col("identifier.confidence")).alias("id_conf_band"),
        primary_turn(F.col("doc_key")).alias("primary_turn"),
        F.col("firstName.status").alias("firstname_status"),
        F.col("firstName.reviewed_by").alias("firstname_reviewed_by"),
        F.col("notes.status").alias("notes_status"),
        F.col("notes.reviewed_value").alias("notes_reviewed_value"),
        F.col("courtDate.status").alias("courtdate_status"),
        F.col("courtDate.reviewed_value").alias("courtdate_reviewed_value"),
    )


_REVIEW_CORE_SQL = f"""
hdr0 AS (SELECT conv_id, run_id, min(ffill_id) AS ident,
           CAST(count(*) AS INT) AS turn_count, min(turn_idx) AS first_turn
         FROM runs GROUP BY conv_id, run_id),
hdr2 AS (SELECT conv_id, run_id,
           CASE WHEN ident IS NOT NULL AND trim(ident) <> '' THEN ident
                ELSE 'unknown-' || conv_id || '-' || CAST(first_turn AS STRING)
           END AS doc_key,
           turn_count, first_turn,
           CAST(substr(conv_id, 2, 6) AS INT) + run_id AS sel
         FROM hdr0)
"""

_O_REVIEW_PROJECTIONS = oracle_cte(
    f"""
, {_RUNS_SQL},
{_REVIEW_CORE_SQL},
idc AS (SELECT r.conv_id, r.run_id, max(c.confidence) AS id_conf
        FROM c JOIN runs r ON c.conv_id = r.conv_id AND c.turn_idx = r.turn_idx
        WHERE c.field = 'identifier' GROUP BY r.conv_id, r.run_id),
p AS (SELECT h.conv_id, h.run_id,
        min(CASE WHEN r.extracted_id = h.doc_key THEN r.turn_idx END)
          AS match_turn
      FROM hdr2 h JOIN runs r
        ON r.conv_id = h.conv_id AND r.run_id = h.run_id
      GROUP BY h.conv_id, h.run_id),
loc AS (SELECT h.conv_id, h.run_id,
          CAST(sum(CASE WHEN r.turn_idx <= coalesce(p.match_turn, h.first_turn)
                   THEN 1 ELSE 0 END) AS INT) AS primary_turn
        FROM hdr2 h
        JOIN p ON p.conv_id = h.conv_id AND p.run_id = h.run_id
        JOIN runs r ON r.conv_id = h.conv_id AND r.run_id = h.run_id
        GROUP BY h.conv_id, h.run_id)
SELECT h.conv_id, h.run_id, h.doc_key,
  CAST(CASE WHEN h.sel % 7 = 6 THEN 13 ELSE
    (CASE WHEN h.sel % 2 = 0 THEN 1 ELSE 0 END) +
    (CASE WHEN h.sel % 3 = 1 THEN 1 ELSE 0 END) +
    (CASE WHEN h.sel % 5 = 3 THEN 1 ELSE 0 END) END AS INT) AS fields_reviewed,
  CASE WHEN h.sel % 7 = 6 THEN 'Reviewed' ELSE 'Pending' END AS review_status,
  CASE WHEN i.id_conf IS NULL THEN 'Unknown'
       WHEN i.id_conf >= 0.85 THEN 'High'
       WHEN i.id_conf >= 0.60 THEN 'Medium'
       ELSE 'Low' END AS id_conf_band,
  l.primary_turn,
  CASE WHEN h.sel % 7 = 6 OR h.sel % 2 = 0 THEN 'Confirmed'
       ELSE 'Pending' END AS firstname_status,
  CASE WHEN h.sel % 7 = 6 THEN '{_CAROL}'
       WHEN h.sel % 2 = 0 THEN '{_ALICE}' END AS firstname_reviewed_by,
  CASE WHEN h.sel % 7 = 6 THEN 'Confirmed'
       WHEN h.sel % 3 = 1 THEN 'Corrected'
       ELSE 'Pending' END AS notes_status,
  CASE WHEN h.sel % 7 <> 6 AND h.sel % 3 = 1
       THEN 'corrected note' END AS notes_reviewed_value,
  CASE WHEN h.sel % 7 = 6 THEN 'Confirmed'
       WHEN h.sel % 5 = 3 THEN 'Corrected'
       ELSE 'Pending' END AS courtdate_status,
  CASE WHEN h.sel % 7 <> 6 AND h.sel % 5 = 3
       THEN '2020-02-29' END AS courtdate_reviewed_value
FROM hdr2 h
JOIN loc l ON l.conv_id = h.conv_id AND l.run_id = h.run_id
LEFT JOIN idc i ON i.conv_id = h.conv_id AND i.run_id = h.run_id
WHERE h.sel % 4 <> 1
""".replace("\n, ", ",\n", 1)
)


def q_status_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operations/status listing: TOP-1 document per conversation (largest
    run wins, deterministic tie-break), then the global ORDER BY … DESC
    LIMIT 20 listing with positions — the reference's list endpoints
    (ORDER BY _ts DESC / MaxItemCount, ``CosmosDbService.cs`` listings).
    """
    from pyspark.sql import Window as W

    from .operators.aggregation import run_headers

    ex = extract_turns(spark_transcripts(spark, sf_dir))
    contribs = extract_field_contributions(ex)
    turns = with_runs(
        with_extracted_identifier(ex.select("conv_id", "turn_idx"), contribs)
    )
    hdr = run_headers(turns)
    per_conv = W.partitionBy("conv_id").orderBy(
        F.desc("turn_count"), F.asc("run_id")
    )
    top = (
        hdr.withColumn("rnk", F.row_number().over(per_conv))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    # Total order: doc_key can repeat across conversations, so conv_id is the
    # final tie-break (engine AND oracle) — positions near the LIMIT boundary
    # are deterministic. orderBy().limit() compiles to TakeOrderedAndProject
    # (per-partition top-20 + merge), so the full corpus never funnels through
    # one task; only the 20 survivors enter the position window.
    order = [F.desc("turn_count"), F.asc("doc_key"), F.asc("conv_id")]
    top20 = top.orderBy(*order).limit(20)
    listing = W.orderBy(*order)
    return (
        top20.withColumn("pos", F.row_number().over(listing).cast("int"))
        .select("pos", "conv_id", "run_id", "doc_key", "turn_count",
                "first_turn")
    )


_O_STATUS_PROJECTION = oracle_cte(
    f"""
, {_RUNS_SQL},
{_REVIEW_CORE_SQL},
rk1 AS (SELECT *, row_number() OVER
          (PARTITION BY conv_id ORDER BY turn_count DESC, run_id) AS rnk
        FROM hdr2),
lst AS (SELECT CAST(row_number() OVER
                 (ORDER BY turn_count DESC, doc_key, conv_id) AS INT) AS pos,
               conv_id, run_id, doc_key, turn_count, first_turn
        FROM rk1 WHERE rnk = 1)
SELECT pos, conv_id, run_id, doc_key, turn_count, first_turn
FROM lst WHERE pos <= 20
""".replace("\n, ", ",\n", 1)
)


# ---------------------------------------------------------------------------
# North-rule queries: selection, anti-join, re-assembly, dates, lineage
# ---------------------------------------------------------------------------


def q_turn_select_reindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Print-dialog turn selection + document-local 1..N re-index."""
    t = spark_transcripts(spark, sf_dir)
    sel = TurnSelection.parse("1-6, 9")
    t = t.filter(F.col("turn_idx").isin(*sel.turns))
    return with_local_index(t).select(
        "conv_id", "turn_idx", "local_idx", "role"
    )


_O_SELECT_REINDEX = oracle_cte(
    """
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INT)
         AS local_idx,
       role
FROM t WHERE (turn_idx BETWEEN 1 AND 6) OR turn_idx = 9
"""
)


def q_dup_skip_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-skip / resume primitive: left-anti join on existing keys.

    No broadcast hint: ``existing`` is corpus-derived (it grows with the
    input), so the join strategy is AQE's call — the same rule the
    production path follows (plans/pipeline.py) and the plan audit
    enforces (no ResolvedHint on corpus-cardinality sides)."""
    t = spark_transcripts(spark, sf_dir)
    existing = (
        t.filter(F.col("doc_id") % 5 == 0).select("conv_id").distinct()
    )
    return (
        t.join(existing, "conv_id", "left_anti")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


_O_DUP_SKIP = oracle_cte(
    """
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
FROM t
WHERE NOT EXISTS (
  SELECT 1 FROM t t2 WHERE t2.doc_id % 5 = 0 AND t2.conv_id = t.conv_id)
GROUP BY conv_id
"""
)


def q_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-conversation re-assembly of extracted content (the
    ImageToPdf page-ordered re-encode analog)."""
    ex = extract_turns(spark_transcripts(spark, sf_dir))
    return ex.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("turn_idx").alias("t"),
                            F.col("extracted_text").alias("x"),
                        )
                    )
                ),
                lambda s: s["x"],
            ),
            "\n\n",
        ).alias("assembled"),
        F.count(F.lit(1)).alias("n_turns"),
    )


_O_REASSEMBLY = oracle_cte(
    """
SELECT conv_id,
       string_agg(text, chr(10) || chr(10) ORDER BY turn_idx) AS assembled,
       CAST(count(*) AS BIGINT) AS n_turns
FROM t GROUP BY conv_id
"""
)


def q_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateFieldParser parity: compact / long-form parsed, garbage and
    ISO-format inputs rejected (null), raw always preserved."""
    raws = _sql_over(spark, sf_dir, _DATE_RAW_SQL, "orders")
    return raws.select(
        "o_orderkey", "raw", parse_ocr_date(F.col("raw")).alias("parsed")
    )


_O_DATE_PARSE = f"""
SELECT o_orderkey, raw,
  CASE WHEN o_orderkey % 4 IN (0, 1)
       THEN strftime(o_orderdate, '%Y-%m-%d') END AS parsed
FROM ({_DATE_RAW_SQL.replace("SELECT o_orderkey,", "SELECT o_orderkey, o_orderdate,")}) r
"""


def q_lineage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition lineage metrics: rows in, conversations, contribution
    (rule-hit) counts — the checkpoint table's aggregation shape."""
    t = spark_transcripts(spark, sf_dir).withColumn(
        "bucket", (F.col("doc_id") % 8).cast("int")
    )
    ex = extract_turns(t)
    contribs = extract_field_contributions(
        ex, keep_cols=("conv_id", "turn_idx", "bucket")
    )
    rows = t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.countDistinct("conv_id").alias("n_convs"),
    )
    hits = contribs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_contribs")
    )
    return rows.join(hits, "bucket", "left").select(
        "bucket", "rows_in", "n_convs",
        F.coalesce("n_contribs", F.lit(0)).alias("n_contribs"),
    )


_O_LINEAGE = oracle_cte(
    f"""
, c AS ({_C_SQL}),
tb AS (SELECT conv_id, turn_idx, CAST(doc_id % 8 AS INT) AS bucket FROM t)
SELECT tb.bucket,
       CAST(count(DISTINCT tb.conv_id || '#' || CAST(tb.turn_idx AS STRING)) AS BIGINT)
         AS rows_in,
       CAST(count(DISTINCT tb.conv_id) AS BIGINT) AS n_convs,
       CAST(count(c.field) AS BIGINT) AS n_contribs
FROM tb LEFT JOIN c
  ON tb.conv_id = c.conv_id AND tb.turn_idx = c.turn_idx
GROUP BY tb.bucket
""".replace("\n, ", ",\n", 1)
)


# ---------------------------------------------------------------------------
# Training-data-pipeline queries: dedup, similarity, text analysis
# ---------------------------------------------------------------------------


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows over the events log: counts, distinct
    users, value min/max, JSON-property sums (batch twin of the streaming
    watermark aggregation in streaming/windows.py)."""
    from .operators.events import windowed_event_stats

    load_views(spark, sf_dir, "events")
    return windowed_event_stats(spark.table("events"))


_O_EVENT_WINDOWS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  min(value) AS min_value,
  max(value) AS max_value,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k
FROM events GROUP BY 1, 2
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle-gap sessionization (30 min) per user — the gaps-and-islands run
    pattern keyed on time deltas."""
    from .operators.events import sessionize_events

    load_views(spark, sf_dir, "events")
    return sessionize_events(spark.table("events"), gap_minutes=30)


_O_EVENT_SESSIONS = """
WITH o AS (SELECT *, lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
b AS (SELECT *, CASE WHEN prev_us IS NULL
                      OR epoch_us(ts) - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT *, CAST(sum(brk) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      FROM b)
SELECT user_id, session_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  min(value) AS min_value,
  max(value) AS max_value
FROM s GROUP BY user_id, session_id
"""


_EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _drain_stream(out, tag: str) -> str:
    """availableNow drain of a streaming DataFrame to a parquet sink;
    returns the output path. The oracle bridge for streaming operators:
    process-the-backlog-then-stop makes the emitted set deterministic."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix=f"sg_stream_{tag}_")
    q = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(d, "out"))
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return os.path.join(d, "out")


def _events_stream(spark: SparkSession, sf_dir: str):
    import os

    # the file stream source requires a directory (or glob) as its basePath;
    # the testdata table is a single file, so glob-ify the final character —
    # matches exactly the same file, but makes sf_dir the basePath
    path = os.path.join(sf_dir, "events.parquet")
    return spark.readStream.schema(_EVENTS_DDL).parquet(
        f"{path[:-1]}[{path[-1]}]"
    )


def q_event_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window counts per event type: 1-hour windows
    every 30 minutes — each event lands in exactly two windows."""
    from .operators.events import sliding_event_counts

    load_views(spark, sf_dir, "events")
    return sliding_event_counts(spark.table("events"))


_O_EVENT_SLIDING = """
WITH s AS (SELECT event_type,
        date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
          THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS w0
      FROM events),
u AS (SELECT event_type, w0 - t.i * INTERVAL 30 MINUTE AS ws
      FROM s, UNNEST([0, 1]) AS t(i))
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM u GROUP BY 1, 2
"""


def q_event_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hour by count — the per-window trending
    listing (rank over the aggregate, never the raw events)."""
    from .operators.events import trending_event_types

    load_views(spark, sf_dir, "events")
    return trending_event_types(spark.table("events"))


_O_EVENT_TRENDING = """
WITH c AS (SELECT date_trunc('hour', ts) AS ws, event_type,
        CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2),
r AS (SELECT *, CAST(row_number() OVER
        (PARTITION BY ws ORDER BY n_events DESC, event_type) AS INT) AS rnk
      FROM c)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       n_events, rnk
FROM r WHERE rnk <= 3
"""


def q_value_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the event value column (bin width 5.0):
    edges, counts, integer ppm shares — numeric profiling before choosing
    clipping constants."""
    from .operators.events import value_histogram

    load_views(spark, sf_dir, "events")
    return value_histogram(spark.table("events"))


_O_VALUE_HIST = """
WITH b AS (SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
        CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM b)
SELECT bin, bin * 5.0 AS lo, (bin + 1) * 5.0 AS hi, n,
       CAST(n * 1000000 // tot AS BIGINT) AS n_ppm
FROM b, t
"""


def q_tool_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role × tool usage profile over the transcripts: turn counts, text
    volume, and per-role conversation reach — the agent-telemetry
    breakdown (which roles call which tools, how much text each lane
    produces) a transcript-curation pass reads before weighting lanes.
    One groupBy((role, tool)) with map-side combine; ``tool`` is null for
    non-tool turns, kept as its own row (the prose lane)."""
    t = spark_transcripts(spark, sf_dir)
    return (
        t.groupBy("role", "tool")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.min("turn_idx").cast("long").alias("first_turn_idx"),
        )
    )


_O_TOOL_USAGE = oracle_cte("""
SELECT role, tool,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(length(text)) AS BIGINT) AS n_chars,
  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
  CAST(min(turn_idx) AS BIGINT) AS first_turn_idx
FROM t GROUP BY role, tool
""")


def q_conv_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation shape profile: turn counts by lane (user /
    assistant / tool), distinct-role fan-out, and text volume — the
    structural fingerprint a transcript-curation pass filters on (e.g.
    drop tool-only conversations, cap monologues). One groupBy(conv_id)
    with map-side combine over conditional sums."""
    t = spark_transcripts(spark, sf_dir)
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        one_if(F.col("role") == "user").alias("n_user"),
        one_if(F.col("role") == "assistant").alias("n_assistant"),
        one_if(F.col("tool").isNotNull()).alias("n_tool_calls"),
        F.countDistinct("role").cast("long").alias("n_roles"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )


_O_CONV_SHAPE = oracle_cte("""
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
  CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_assistant,
  CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_tool_calls,
  CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
  CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM t GROUP BY conv_id
""")


def q_turn_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-transition profile over the transcripts: counts of each
    (previous role → role) bigram across conversations, with a synthetic
    '<start>' state for first turns — the alternation fingerprint a
    dialogue-curation pass checks before assuming user/assistant turn
    structure (tool-call storms and monologues show up as heavy self-
    transitions). One lag window under the conversation partitioning, one
    groupBy with map-side combine."""
    from pyspark.sql import Window as W

    t = spark_transcripts(spark, sf_dir)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    return (
        t.select(
            "conv_id",
            F.coalesce(prev, F.lit("<start>")).alias("from_role"),
            F.col("role").alias("to_role"),
        )
        .groupBy("from_role", "to_role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
    )


_O_TURN_TRANSITIONS = oracle_cte("""
SELECT from_role, to_role,
  CAST(count(*) AS BIGINT) AS n_transitions,
  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM (SELECT conv_id,
        coalesce(lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                 '<start>') AS from_role,
        role AS to_role
      FROM t) x
GROUP BY 1, 2
""")


def q_turn_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript integrity lint, per conversation: empty-text turns,
    unknown roles, turn-index gaps and duplicates, consecutive same-role
    runs, tool values on non-tool turns — the structural validation gate
    an ingest runs before a corpus is admitted to training (malformed
    conversations poison turn-ordering invariants downstream). One lag
    window + one groupBy, both under the conversation partitioning."""
    from pyspark.sql import Window as W

    t = spark_transcripts(spark, sf_dir)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    prev_idx = F.lag("turn_idx").over(w)
    prev_role = F.lag("role").over(w)
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    flagged = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.col("text"),
        prev_idx.alias("_pidx"),
        prev_role.alias("_prole"),
    )
    out = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        one_if(F.trim(F.col("text")) == "").alias("n_empty_text"),
        one_if(
            ~F.col("role").isin("user", "assistant", "system", "tool")
        ).alias("n_bad_role"),
        one_if(
            F.col("_pidx").isNotNull()
            & (F.col("turn_idx") != F.col("_pidx") + 1)
        ).alias("n_idx_gaps"),
        one_if(F.col("role") == F.col("_prole")).alias("n_same_role_steps"),
        one_if(
            F.col("tool").isNotNull() & (F.col("role") != "tool")
        ).alias("n_tool_on_nontool"),
    )
    return out.withColumn(
        "is_clean",
        (F.col("n_empty_text") == 0)
        & (F.col("n_bad_role") == 0)
        & (F.col("n_idx_gaps") == 0)
        & (F.col("n_tool_on_nontool") == 0),
    )


_O_TURN_LINT = oracle_cte("""
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_empty_text,
  CAST(sum(CASE WHEN role NOT IN ('user','assistant','system','tool')
       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_role,
  CAST(sum(CASE WHEN pidx IS NOT NULL AND turn_idx <> pidx + 1
       THEN 1 ELSE 0 END) AS BIGINT) AS n_idx_gaps,
  CAST(sum(CASE WHEN role = prole THEN 1 ELSE 0 END) AS BIGINT)
    AS n_same_role_steps,
  CAST(sum(CASE WHEN tool IS NOT NULL AND role <> 'tool'
       THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_on_nontool,
  (sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) = 0
   AND sum(CASE WHEN role NOT IN ('user','assistant','system','tool')
           THEN 1 ELSE 0 END) = 0
   AND sum(CASE WHEN pidx IS NOT NULL AND turn_idx <> pidx + 1
           THEN 1 ELSE 0 END) = 0
   AND sum(CASE WHEN tool IS NOT NULL AND role <> 'tool'
           THEN 1 ELSE 0 END) = 0) AS is_clean
FROM (SELECT conv_id, turn_idx, role, tool, text,
        lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pidx,
        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prole
      FROM t) x
GROUP BY conv_id
""")


def q_turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-turn latency profile: exact p50/p90/p99 of the seconds
    between consecutive turns, grouped by the RESPONDING role — the
    agent-telemetry number (how long do assistant/tool turns take to
    arrive) a transcript-quality pass thresholds on. One lag window under
    the conversation partitioning feeding the skew-safe histogram
    quantile operator (dominant role ≈ dominant language: the two-pass
    histogram shape is what keeps p99-of-assistant from funneling through
    one task at corpus scale)."""
    from pyspark.sql import Window as W

    from .operators.sampling import group_quantiles

    t = spark_transcripts(spark, sf_dir)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    delta = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    lat = t.select("role", delta.alias("delta_s")).filter(
        F.col("delta_s").isNotNull()
    )
    return group_quantiles(
        lat, group_col="role", value_col="delta_s", qs=(0.5, 0.9, 0.99)
    )


# ts is Spark-side (epoch = doc_id·60 + 1704067200, sources/derive.py);
# the oracle recomputes the same epoch directly from doc_id — pure BIGINT.
_O_TURN_LATENCY = oracle_cte("""
SELECT r.role, CAST(t.q AS INT) AS q, CAST(r.v AS BIGINT) AS value
FROM (
  SELECT role, v,
         row_number() OVER (PARTITION BY role ORDER BY v) - 1 AS rn
  FROM (SELECT role,
          doc_id * 60 + 1704067200
            - lag(doc_id * 60 + 1704067200) OVER
                (PARTITION BY conv_id ORDER BY turn_idx) AS v
        FROM t) d
  WHERE v IS NOT NULL) r
JOIN (
  SELECT role, u.q AS q, CAST(floor(u.qf * (n - 1)) AS BIGINT) AS idx
  FROM (SELECT role, count(*) AS n
        FROM (SELECT role,
                lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                  AS p
              FROM t) z
        WHERE p IS NOT NULL GROUP BY role) c,
       (VALUES (500, 0.5), (900, 0.9), (990, 0.99)) AS u(q, qf)
) t ON r.role = t.role AND r.rn = t.idx
""")


def q_session_size_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-size distribution: exact discrete quantiles (p50/p90/p99)
    of events-per-session over the gap-sessionized log — the composition
    of the sessionizer with the group-quantile operator (state-store and
    batch-size budgets come straight from these numbers)."""
    from .operators.events import sessionize_events
    from .operators.sampling import group_quantiles

    load_views(spark, sf_dir, "events")
    sessions = sessionize_events(spark.table("events")).select(
        F.lit("all").alias("grp"), F.col("n_events")
    )
    return group_quantiles(
        sessions, group_col="grp", value_col="n_events",
        qs=(0.5, 0.9, 0.99),
    )


_O_SESSION_SIZE_Q = f"""
WITH sess AS ({{sessions}}),
r AS (SELECT 'all' AS grp, n_events AS v,
        row_number() OVER (ORDER BY n_events) - 1 AS rn
      FROM sess),
c AS (SELECT count(*) AS n FROM r),
t AS (SELECT u.q AS q, CAST(floor(u.qf * (n - 1)) AS BIGINT) AS idx
      FROM c, (VALUES (500, 0.5), (900, 0.9), (990, 0.99)) AS u(q, qf))
SELECT r.grp, CAST(t.q AS INT) AS q, CAST(r.v AS BIGINT) AS value
FROM r JOIN t ON r.rn = t.idx
"""


def q_streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of event_windows, oracle-checked: watermarked tumbling
    windows drained with availableNow. Append mode emits exactly the
    FINALIZED windows — those whose end ≤ the final watermark
    (max event time − 2 h); the oracle applies the same cutoff."""
    from .streaming.windows import streaming_windowed_counts

    path = _drain_stream(
        streaming_windowed_counts(_events_stream(spark, sf_dir)), "win"
    )
    return spark.read.parquet(path)


_O_STREAMING_WINDOWS = """
SELECT window_start, event_type, n_events FROM (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         date_trunc('hour', min(ts)) + INTERVAL 1 HOUR AS wend
  FROM events GROUP BY 1, 2)
WHERE wend <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of event_sessions, oracle-checked: stateful
    applyInPandasWithState sessionization drained with availableNow. The
    emitted set is every CLOSED session (a later same-user event arrived
    beyond the 30-min gap); each user's open tail stays in the state store,
    so the oracle excludes each user's final session."""
    from .streaming.windows import streaming_sessionize

    path = _drain_stream(
        streaming_sessionize(_events_stream(spark, sf_dir), gap_minutes=30),
        "sess",
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    out = spark.read.parquet(path)
    return out.select(
        "user_id",
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        "n_events",
    )


_O_STREAMING_SESSIONS = """
WITH o AS (SELECT *, lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
b AS (SELECT *, CASE WHEN prev_us IS NULL
                      OR epoch_us(ts) - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT *, CAST(sum(brk) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      FROM b),
agg AS (SELECT user_id, session_id,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
          strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
          CAST(count(*) AS INT) AS n_events
        FROM s GROUP BY user_id, session_id)
SELECT user_id, session_start, session_end, n_events
FROM agg a
WHERE session_id < (SELECT max(session_id) FROM agg m
                    WHERE m.user_id = a.user_id)
"""


def q_streaming_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-end open-tail flush, oracle-checked against the FULL batch
    sessionization: the availableNow drain emits every closed session,
    then the checkpoint's state store is read back with the state data
    source and each user's open tail is flushed as a final session row.
    closed ∪ flush must equal the batch twin exactly — no session lost in
    state, none emitted twice (the round-3 'open tail stays in state'
    convention made drain-complete)."""
    import os
    import tempfile

    from .streaming.windows import read_open_sessions, streaming_sessionize

    d = tempfile.mkdtemp(prefix="sg_stream_flush_")
    out_dir, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
    q = (
        streaming_sessionize(_events_stream(spark, sf_dir), gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    cols = [
        F.col("user_id"),
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        F.col("n_events").cast("int").alias("n_events"),
    ]
    closed = spark.read.parquet(out_dir).select(*cols)
    flushed = read_open_sessions(spark, ckpt).select(*cols)
    return closed.unionByName(flushed)


_O_STREAMING_FLUSH = """
WITH o AS (SELECT *, lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
b AS (SELECT *, CASE WHEN prev_us IS NULL
                      OR epoch_us(ts) - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT *, CAST(sum(brk) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      FROM b)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
  CAST(count(*) AS INT) AS n_events
FROM s GROUP BY user_id, session_id
"""


def q_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, oracle-checked: the events stream LEFT
    joins the static customer dimension (user → market segment) per
    micro-batch — no streaming state, no watermark — then the drained
    output is rolled up per (segment, event_type). The batch oracle is the
    identical join+rollup, so every streamed row must be enriched exactly
    once."""
    from .streaming.windows import stream_static_enrich

    load_views(spark, sf_dir, "customer")
    dim = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = stream_static_enrich(
        _events_stream(spark, sf_dir), dim, "user_id", ("segment",)
    )
    path = _drain_stream(enriched, "enrich")
    return (
        spark.read.parquet(path)
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
    )


_O_STREAMING_ENRICH = """
SELECT c.c_mktsegment AS segment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       min(e.event_id) AS min_event,
       max(e.event_id) AS max_event
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, oracle-checked: clicks stream joined
    to the views stream of the same user within the following hour
    (attribution shape), drained with availableNow. Inner-join emission
    does not wait for the watermark, so the drained set equals the batch
    join under the identical time bound."""
    from .streaming.windows import streaming_interval_join

    clicks = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    views = _events_stream(spark, sf_dir).filter(
        F.col("event_type") == "view"
    )
    joined = streaming_interval_join(clicks, views).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("view_id"),
        F.col("l.user_id").alias("user_id"),
    )
    path = _drain_stream(joined, "ssjoin")
    return spark.read.parquet(path)


_O_STREAMING_JOIN = """
SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
FROM events c JOIN events v
  ON c.user_id = v.user_id
 AND v.ts >= c.ts AND v.ts < c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND v.event_type = 'view'
"""


#: shared reference-point derivation (dialect-neutral): one row per
#: (user, hour) — unique as-of keys by construction
_REF_POINTS = """
  SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS ref_value
  FROM events GROUP BY user_id, date_trunc('hour', ts)
"""

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def q_asof_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event annotated with the latest per-user hourly
    reference point at-or-before it — one sort-shuffle union/forward-fill,
    never a nested loop (the DuckDB oracle uses its native ASOF JOIN)."""
    from .operators.events import asof_join

    load_views(spark, sf_dir, "events")
    left = spark.table("events").select("event_id", "user_id", "ts", "value")
    right = _sql_over(spark, sf_dir, _REF_POINTS, "events")
    out = asof_join(left, right, payload=("ref_value",))
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        "value",
        F.date_format("asof_ts", _TS_FMT_SPARK).alias("asof_ts"),
        "ref_value",
    )


_O_ASOF_REF = f"""
WITH ref AS ({_REF_POINTS})
SELECT e.event_id, e.user_id,
  strftime(e.ts, '{_TS_FMT_DUCK}') AS ts,
  e.value,
  strftime(r.ts, '{_TS_FMT_DUCK}') AS asof_ts,
  r.ref_value
FROM events e ASOF LEFT JOIN ref r
  ON e.user_id = r.user_id AND e.ts >= r.ts
"""

#: shared interval derivation (dialect-neutral): a 10-minute attribution
#: window opens at every click
_CLICK_WINDOWS = """
  SELECT event_id AS interval_id, user_id, ts AS start_ts,
         ts + INTERVAL 10 MINUTE AS end_ts
  FROM events WHERE event_type = 'click'
"""


def q_interval_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events landing inside any same-user 10-minute
    click-attribution window — bucketed equi-join shape (explode intervals
    over covered time buckets, join on (user, bucket), residual range
    filter), never O(points × intervals)."""
    from .operators.events import interval_join

    load_views(spark, sf_dir, "events")
    points = spark.table("events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    intervals = _sql_over(spark, sf_dir, _CLICK_WINDOWS, "events")
    out = interval_join(points, intervals, bucket_minutes=10)
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        "event_type",
        "interval_id",
        F.date_format("start_ts", _TS_FMT_SPARK).alias("start_ts"),
    )


_O_INTERVAL_HITS = f"""
WITH iv AS ({_CLICK_WINDOWS})
SELECT e.event_id, e.user_id,
  strftime(e.ts, '{_TS_FMT_DUCK}') AS ts,
  e.event_type,
  iv.interval_id,
  strftime(iv.start_ts, '{_TS_FMT_DUCK}') AS start_ts
FROM events e JOIN iv
  ON e.user_id = iv.user_id
 AND e.ts >= iv.start_ts AND e.ts <= iv.end_ts
"""


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup on (user_id, event_type), oracle-checked:
    watermarked ``dropDuplicates`` drained with availableNow emits exactly
    the distinct key set (first arrival wins, later duplicates dropped) —
    the incremental-ingest twin of the batch duplicate-skip anti-join."""
    from .streaming.windows import streaming_dedup_keys

    path = _drain_stream(
        streaming_dedup_keys(_events_stream(spark, sf_dir)), "dedup"
    )
    return spark.read.parquet(path)


_O_STREAMING_DEDUP = "SELECT DISTINCT user_id, event_type FROM events"


def q_streaming_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-mode streaming running totals per event type, republished
    to a parquet dir by idempotent overwrite each micro-batch; after the
    availableNow drain the dir equals the batch groupBy of the backlog."""
    import os
    import tempfile

    from .streaming.windows import streaming_totals_to_dir

    d = tempfile.mkdtemp(prefix="sg_stream_totals_")
    out = os.path.join(d, "out")
    streaming_totals_to_dir(_events_stream(spark, sf_dir), out)
    return spark.read.parquet(out)


_O_STREAMING_TOTALS = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_EXACT}) corpus", "documents"
    )
    return exact_dedup_groups(corpus)


_O_DEDUP_EXACT = f"""
SELECT md5(text) AS fingerprint,
       min(doc_id) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM ({_CORPUS_EXACT}) corpus GROUP BY 1
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    sigs = minhash_signatures(word_shingles(corpus))
    return lsh_candidate_pairs(sigs)


_O_MINHASH_LSH = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id
"""


def q_minhash_lsh_mid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-profile MinHash/LSH (16 hashes, 4 bands × 4 rows): verifies the
    banding math at a second shape between the 8-hash demo and the
    128-hash SCALE_PROFILE (whose collision probabilities are pinned in
    tests/test_training_ops.py but are too wide for a DuckDB twin)."""
    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    sigs = minhash_signatures(word_shingles(corpus), num_hashes=16)
    return lsh_candidate_pairs(sigs, rows_per_band=4)


_O_MINHASH_LSH_MID = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST(range(0, 16)) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < b.doc_id
"""


def q_dedup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup: the near-dup corpus split into an EXISTING
    store (original ids) and a NEW batch (the planted +100000 copies);
    candidates are generated only across the batch boundary — the
    daily-crawl-vs-corpus ingest shape."""
    from .operators.dedup import lsh_incremental_pairs

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    existing = corpus.filter(F.col("doc_id") < 100000)
    new = corpus.filter(F.col("doc_id") >= 100000)
    return lsh_incremental_pairs(
        minhash_signatures(word_shingles(existing)),
        minhash_signatures(word_shingles(new)),
    )


_O_DEDUP_INCR = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2)
SELECT DISTINCT a.doc_id AS existing_id, b.doc_id AS new_id
FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
WHERE a.doc_id < 100000 AND b.doc_id >= 100000
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = _sql_over(spark, sf_dir, _NEAR_PAIRS, "documents")
    return ngram_jaccard(word_shingles(corpus), pairs)


_O_NGRAM_JACCARD = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pairs AS ({_NEAR_PAIRS}),
inter AS (SELECT p.id_a, p.id_b, count(*) AS inter
          FROM pairs p
          JOIN sh a ON a.doc_id = p.id_a
          JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
          GROUP BY p.id_a, p.id_b)
SELECT i.id_a, i.id_b, CAST(i.inter AS BIGINT) AS inter,
       CAST(za.sz + zb.sz - i.inter AS BIGINT) AS union_n,
       i.inter / (za.sz + zb.sz - i.inter) AS jaccard
FROM inter i
JOIN sz za ON za.doc_id = i.id_a
JOIN sz zb ON zb.doc_id = i.id_b
"""


def q_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of the near-dup candidate pairs:
    exact Levenshtein + sim_ppm over the same seeded corpus/pairs the
    Jaccard verify uses — the char-level last rung of the ladder."""
    from .operators.dedup import edit_distance_verify

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = _sql_over(spark, sf_dir, _NEAR_PAIRS, "documents")
    return edit_distance_verify(corpus, pairs)


_O_EDIT_VERIFY = f"""
WITH corpus AS ({_CORPUS_NEAR}),
pairs AS ({_NEAR_PAIRS}),
j AS (SELECT p.id_a, p.id_b,
    CAST(length(a.text) AS BIGINT) AS len_a,
    CAST(length(b.text) AS BIGINT) AS len_b,
    CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev_dist
  FROM pairs p
  JOIN corpus a ON a.doc_id = p.id_a
  JOIN corpus b ON b.doc_id = p.id_b)
SELECT id_a, id_b, len_a, len_b,
  CAST(abs(len_a - len_b) AS BIGINT) AS len_gap,
  lev_dist,
  CAST(CASE WHEN greatest(len_a, len_b) = 0 THEN 1000000
    ELSE CAST(greatest(len_a, len_b) - lev_dist AS HUGEINT) * 1000000
      // greatest(len_a, len_b) END AS BIGINT) AS sim_ppm
FROM j
"""


#: role override for the turn-merge query: the derived corpus has a
#: constant role per conversation (doc_id % 4 ≡ conv % 4), so both
#: engines re-derive a turn-dependent role that produces real same-role
#: runs (user,user,assistant,tool cycling by turn)
_MERGE_ROLE_SQL = (
    "CASE turn_idx % 4 WHEN 1 THEN 'user' WHEN 2 THEN 'user'"
    " WHEN 3 THEN 'assistant' ELSE 'tool' END"
)


def q_turn_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive same-role turn merge (gaps-and-islands re-index with
    order-pinned text concat) over the derived transcripts with a
    turn-cycling role so same-role runs actually occur (see
    :func:`~poc_document_ocr_spark.operators.examples.merge_same_role_turns`)."""
    from .operators.examples import merge_same_role_turns

    t = spark_transcripts(spark, sf_dir).withColumn(
        "role", F.expr(_MERGE_ROLE_SQL)
    )
    return merge_same_role_turns(t)


_O_TURN_MERGE = oracle_cte(f"""
, x AS (SELECT conv_id, turn_idx, {_MERGE_ROLE_SQL} AS role, text FROM t),
c AS (SELECT *,
    CASE WHEN lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           IS DISTINCT FROM role THEN 1 ELSE 0 END AS chg
  FROM x),
i AS (SELECT *, sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
    ROWS UNBOUNDED PRECEDING) AS island FROM c)
SELECT conv_id,
  CAST(island AS BIGINT) AS new_turn_idx,
  min(role) AS role,
  string_agg(text, chr(10) ORDER BY turn_idx) AS text,
  CAST(count(*) AS BIGINT) AS n_merged,
  min(turn_idx) AS first_turn,
  max(turn_idx) AS last_turn
FROM i GROUP BY conv_id, island
""")

#: system-prompt override: a 3-prompt canned head plus a 1-in-7
#: long-tail of unique prompts — the census must get both right
_SYS_TEXT_SQL = (
    "CASE WHEN doc_id % 7 = 0 THEN 'rare prompt ' || CAST(doc_id AS STRING)"
    " ELSE 'canned prompt ' || CAST(doc_id % 3 AS STRING) END"
)


def q_sys_prompts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """System-prompt census over the derived transcripts' system turns,
    with a canned-head + long-tail prompt override shared with the
    oracle (see
    :func:`~poc_document_ocr_spark.operators.examples.system_prompt_profile`)."""
    from .operators.examples import system_prompt_profile

    t = spark_transcripts(spark, sf_dir).withColumn(
        "text", F.expr(_SYS_TEXT_SQL)
    )
    return system_prompt_profile(t)


_O_SYS_PROMPTS = oracle_cte(f"""
, s AS (SELECT conv_id, {_SYS_TEXT_SQL} AS text FROM t
        WHERE role = 'system'),
pc AS (SELECT text, conv_id, CAST(count(*) AS BIGINT) AS n
       FROM s GROUP BY 1, 2),
pt AS (SELECT text, CAST(sum(n) AS BIGINT) AS n_turns,
         CAST(count(*) AS BIGINT) AS n_convs
       FROM pc GROUP BY text),
tot AS (SELECT CAST(sum(n_turns) AS BIGINT) AS _tot FROM pt)
SELECT text, n_turns, n_convs,
  CAST(CAST(n_turns AS HUGEINT) * 1000000 // greatest(_tot, 1)
    AS BIGINT) AS share_ppm
FROM pt, tot
""")


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup ladder: 64-bit fingerprints, 8-bit block equi-join
    for candidates (complete for Hamming ≤ 7), exact Hamming filter."""
    from .operators.dedup import simhash64, simhash_near_pairs

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    return simhash_near_pairs(simhash64(corpus), max_hamming=7)


def _simhash_oracle_sql() -> str:
    """DuckDB twin of simhash64 + simhash_near_pairs, generated from the
    same bit layout."""
    hexs = "0123456789abcdef"
    sums = ",\n    ".join(
        f"sum((((strpos('{hexs}', substr(md5(w), {j // 4 + 1}, 1)) - 1) "
        f">> {3 - j % 4}) & 1) * 2 - 1) AS b{j}"
        for j in range(64)
    )
    nibbles = " || ".join(
        "substr('" + hexs + "', ("
        + " + ".join(
            f"(CASE WHEN b{4 * q + r} >= 0 THEN {8 >> r} ELSE 0 END)"
            for r in range(4)
        )
        + ") + 1, 1)"
        for q in range(16)
    )
    hamming = " + ".join(
        f"bit_count(xor(strpos('{hexs}', substr(sh_a, {q + 1}, 1)) - 1, "
        f"strpos('{hexs}', substr(sh_b, {q + 1}, 1)) - 1))"
        for q in range(16)
    )
    return f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS w
        FROM corpus) u
      WHERE w <> ''),
s AS (SELECT doc_id,
    {sums}
  FROM w GROUP BY doc_id),
fp AS (SELECT doc_id, {nibbles} AS simhash FROM s),
blk AS (SELECT doc_id, simhash, q AS blk, substr(simhash, 2 * q + 1, 2) AS val
        FROM fp, UNNEST(range(0, 8)) AS t(q)),
cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            a.simhash AS sh_a, b.simhash AS sh_b
          FROM blk a JOIN blk b ON a.blk = b.blk AND a.val = b.val
          WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST({hamming} AS INT) AS hamming
FROM cands
WHERE {hamming} <= 7
"""


_O_SIMHASH_NEARDUP = _simhash_oracle_sql()


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_docs(spark, sf_dir))


_O_TOKEN_STATS = """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
    AS n_alpha_chars,
  length(replace(text, ' ', '')) / len(string_split(text, ' '))
    AS avg_token_len,
  len(list_filter(string_split(text, ' '),
      x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','it')))
    / len(string_split(text, ' ')) AS stopword_ratio
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_docs(spark, sf_dir))


_O_LANG_ID = """
WITH h AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('the','and','of','is'))) AS BIGINT) AS hits_en,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('el','la','los','que'))) AS BIGINT) AS hits_es,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('le','la','les','est'))) AS BIGINT) AS hits_fr,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('der','die','und','ist'))) AS BIGINT) AS hits_de
  FROM documents)
SELECT doc_id, hits_en, hits_es, hits_fr, hits_de,
  CASE WHEN hits_de > greatest(hits_en, hits_es, hits_fr) THEN 'de'
       WHEN hits_fr > greatest(hits_en, hits_es) THEN 'fr'
       WHEN hits_es > hits_en THEN 'es'
       ELSE 'en' END AS pred_lang
FROM h
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning quality signals + keep/drop verdict (Gopher-style
    character-class ratios and token-shape bounds)."""
    from .operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


_O_QUALITY_SCORE = """
WITH s AS (SELECT doc_id,
    CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS n_punct,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      AS n_digit,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT)
      AS n_upper,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
  FROM documents)
SELECT doc_id, n_punct,
  n_punct / n_chars AS punct_ratio,
  n_digit / n_chars AS digit_ratio,
  n_upper / n_chars AS upper_ratio,
  n_nonspace / n_tokens AS avg_token_len,
  (n_tokens >= 5 AND n_tokens <= 100000
   AND n_nonspace / n_tokens >= 2.0 AND n_nonspace / n_tokens <= 12.0
   AND n_punct / n_chars <= 0.30 AND n_digit / n_chars <= 0.50) AS keep
FROM s
"""


def q_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) rolling-hash fingerprints: distinct per-window
    minimum k-gram hashes per document."""
    from .operators.textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=8, w=4)


_O_WINNOW_FP = """
WITH g AS (SELECT doc_id,
    list_transform(range(1, length(text) - 8 + 2),
                   i -> md5(substr(text, i, 8))) AS gh
  FROM documents WHERE length(text) >= 11),
w AS (SELECT doc_id,
    list_distinct(list_transform(range(0, len(gh) - 4 + 1),
                  j -> list_min(list_slice(gh, j + 1, j + 4)))) AS fps
  FROM g)
SELECT doc_id, UNNEST(fps) AS fp FROM w
"""


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap detection end-to-end: winnowing fingerprints →
    inverted index on fingerprint → boilerplate-fingerprint drop (fps in
    > 10 docs carry no signal, the standard MOSS ignore list) → pair
    overlap counts ≥ 5. The fingerprint bucket join IS the candidate
    generator — no all-pairs shape at any scale, and the frequency cap
    bounds every bucket's fan-out."""
    from .operators.textstats import winnow_fingerprints, winnow_overlap_pairs

    wf = winnow_fingerprints(_docs(spark, sf_dir), k=8, w=4)
    return winnow_overlap_pairs(wf, min_df=2, max_df=10, min_shared=5)


_O_WINNOW_OVERLAP = """
WITH g AS (SELECT doc_id,
    list_transform(range(1, length(text) - 8 + 2),
                   i -> md5(substr(text, i, 8))) AS gh
  FROM documents WHERE length(text) >= 11),
w AS (SELECT doc_id,
    list_distinct(list_transform(range(0, len(gh) - 4 + 1),
                  j -> list_min(list_slice(gh, j + 1, j + 4)))) AS fps
  FROM g),
wf AS (SELECT doc_id, UNNEST(fps) AS fp FROM w),
rare AS (SELECT fp FROM wf GROUP BY fp
         HAVING count(*) BETWEEN 2 AND 10),
wfr AS (SELECT wf.doc_id, wf.fp FROM wf JOIN rare USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM wfr a JOIN wfr b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 5
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_docs(spark, sf_dir))


_O_FINGERPRINT = r"""
SELECT doc_id,
  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
  substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 8)
    AS fingerprint_short
FROM documents
"""


def _media_payload() -> F.Column:
    """Demo media payload: documents' bytes behind real magic-number
    prefixes by doc_id — deterministic, byte-identical in both engines."""
    body = F.encode(F.col("text"), "utf-8")
    d = F.col("doc_id")
    return (
        F.when(d % 4 == 0, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), body))
        .when(d % 4 == 1, F.concat(F.unhex(F.lit("FFD8FFE0")), body))
        .when(
            d % 4 == 2,
            F.concat(F.unhex(F.lit("524946460000000057415645")), body),
        )
        .otherwise(body)
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns, metadata tier: magic-number format sniff, byte
    length, head bytes, content digest, and frame count via fixed-size
    chunking — all without decoding a payload."""
    from .operators.multimodal import chunk_frames, media_meta

    docs = _docs(spark, sf_dir)
    with_payload = docs.select("doc_id", _media_payload().alias("payload"))
    frames_n = (
        chunk_frames(with_payload, frame_bytes=256)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_frames"))
    )
    meta = with_payload.select(
        "doc_id", media_meta(F.col("payload")).alias("m")
    )
    return meta.join(frames_n, "doc_id").select(
        "doc_id",
        F.col("m.fmt").alias("fmt"),
        F.col("m.n_bytes").alias("n_bytes"),
        F.col("m.head_hex").alias("head_hex"),
        F.col("m.content_md5").alias("content_md5"),
        "n_frames",
    )


_O_MULTIMODAL_META = r"""
WITH p AS (SELECT doc_id,
  CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB || encode(text)
    WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
    WHEN 2 THEN '\x52\x49\x46\x46\x00\x00\x00\x00\x57\x41\x56\x45'::BLOB
                || encode(text)
    ELSE encode(text) END AS payload
  FROM documents)
SELECT doc_id,
  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
       WHEN 2 THEN 'wav' ELSE 'bin' END AS fmt,
  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
  left(hex(payload), 16) AS head_hex,
  md5(hex(payload)) AS content_md5,
  greatest(CAST(ceil(octet_length(payload) / 256.0) AS INT), 1) AS n_frames
FROM p
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode tier: Arrow-batched mapInPandas over raw payload bytes (the
    codec itself is a deterministic byte-stats stand-in — see
    operators/multimodal.py — so the oracle can reproduce the features)."""
    from .operators.multimodal import decode_media_features

    docs = _docs(spark, sf_dir)
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return decode_media_features(with_payload)


_O_MULTIMODAL_DECODE = """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x)))
    AS BIGINT) AS byte_sum,
  list_sum(list_transform(string_split(text, ''), x -> ascii(x)))
    / length(text) AS byte_mean,
  CAST(NULL AS BIGINT) AS width,
  CAST(NULL AS BIGINT) AS height,
  'bytestats' AS decoder
FROM documents
"""


#: Fixed sign-LSH hyperplanes (4 bits → 16 buckets over 64-dim embeddings):
#: deterministic small integers, shared verbatim with the DuckDB oracle — a
#: production job ships these as job args, never RNG in executors.
_ANN_PLANES = [
    [((7 * i + 3 * j) % 11) - 5 for j in range(64)] for i in range(4)
]


def _plane_sql(p: list[int]) -> str:
    return "[" + ", ".join(f"{float(x):.1f}" for x in p) + "]"


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate nearest neighbors: sign-LSH bucket join + exact
    cosine within buckets — the O(N/2^bits) scale path next to the
    brute-force ``ann_topk`` baseline."""
    from .operators.similarity import lsh_topk

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, _ANN_PLANES, k=5)


_ANN_BUCKET_CTE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v,
        CAST(
          (CASE WHEN list_dot_product(v, {_plane_sql(_ANN_PLANES[0])}) >= 0
                THEN 1 ELSE 0 END)
        + 2 * (CASE WHEN list_dot_product(v, {_plane_sql(_ANN_PLANES[1])}) >= 0
                THEN 1 ELSE 0 END)
        + 4 * (CASE WHEN list_dot_product(v, {_plane_sql(_ANN_PLANES[2])}) >= 0
                THEN 1 ELSE 0 END)
        + 8 * (CASE WHEN list_dot_product(v, {_plane_sql(_ANN_PLANES[3])}) >= 0
                THEN 1 ELSE 0 END)
        AS BIGINT) AS bucket
      FROM e)"""

_O_ANN_LSH = f"""
{_ANN_BUCKET_CTE},
q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 5),
qp AS (SELECT q_id, qv, p.pb AS bucket
       FROM q, UNNEST([bucket, xor(bucket, 1), xor(bucket, 2),
                       xor(bucket, 4), xor(bucket, 8)]) AS p(pb)),
s AS (SELECT qp.q_id, b.vec_id AS n_id, b.bucket,
        list_dot_product(qp.qv, b.v) /
        (sqrt(list_dot_product(qp.qv, qp.qv)) *
         sqrt(list_dot_product(b.v, b.v))) AS cos
      FROM qp JOIN b ON b.bucket = qp.bucket AND b.vec_id <> qp.q_id),
r AS (SELECT q_id, n_id, bucket,
        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
          AS INT) AS rank
      FROM s)
SELECT q_id, n_id, bucket, rank FROM r WHERE rank <= 5
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index health check: per-query recall@5 of the bucketed sign-LSH
    path against the exact cosine baseline, as integer percent — the
    go/no-go metric a pipeline records before trusting an approximate
    index for dedup or retrieval. Composes the engine's own two ANN paths;
    the semi-join counts exact neighbors the approximate index recovered."""
    from .operators.similarity import lsh_topk

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).select("q_id", "n_id")
    approx = lsh_topk(emb, queries, _ANN_PLANES, k=5).select(
        "q_id", "n_id", F.lit(1).cast("long").alias("_hit")
    )
    # one left join + one groupBy: the expensive exact subtree (brute-force
    # cosine over the corpus) is consumed exactly ONCE — a semi-join +
    # separate per-query count would evaluate it twice with no persist
    return (
        exact.join(approx, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_exact"),
            F.sum(F.coalesce("_hit", F.lit(0).cast("long"))).alias(
                "n_hits"
            ),
        )
        .select(
            "q_id",
            "k_exact",
            "n_hits",
            F.expr("n_hits * 100 div k_exact").alias("recall_pct"),
        )
    )


def q_cos_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-LSH-bucket candidates
    (never all-pairs), exact cosine threshold within buckets. At corpus
    scale the bucket count (bits) grows so within-bucket pair counts stay
    bounded; AQE splits any hot bucket."""
    from .operators.similarity import dot, norm, signlsh_buckets

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    b = signlsh_buckets(emb, _ANN_PLANES)
    bn = b.withColumn("_nrm", norm(F.col("embedding")))
    a = bn.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("_nrm").alias("_na"), "bucket",
    )
    c = bn.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("_nrm").alias("_nb"), "bucket",
    )
    pairs = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
    # per-vector norms hoisted before the self-join (pair-stage hoist)
    cos = dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb"))
    return pairs.filter(cos >= 0.2).select("id_a", "id_b", "bucket")


_O_COS_NEARDUP = f"""
{_ANN_BUCKET_CTE},
p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket,
        list_dot_product(a.v, c.v) /
        (sqrt(list_dot_product(a.v, a.v)) *
         sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
SELECT id_a, id_b, bucket FROM p WHERE cos >= 0.2
"""


def q_emb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus health profile per label: vector count, dimension,
    and squared-norm extremes — the sanity pass before trusting an
    embedding table for ANN/dedup (zero or wildly varying norms mean a
    broken encoder batch). Norm² is a deterministic left-fold dot product
    (identical order in the DuckDB twin); min/max of identically-computed
    doubles are the only float aggregates the oracle allows."""
    from .operators.similarity import dot

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    n2 = dot(F.col("embedding"), F.col("embedding"))
    return (
        emb.select("label", F.size("embedding").alias("dim"), n2.alias("n2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("dim").cast("long").alias("min_dim"),
            F.max("dim").cast("long").alias("max_dim"),
            F.min("n2").alias("min_norm2"),
            F.max("n2").alias("max_norm2"),
        )
    )


_O_EMB_STATS = """
SELECT label,
  CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(min(len(embedding)) AS BIGINT) AS min_dim,
  CAST(max(len(embedding)) AS BIGINT) AS max_dim,
  min(list_dot_product(CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[]))) AS min_norm2,
  max(list_dot_product(CAST(embedding AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[]))) AS max_norm2
FROM embeddings GROUP BY label
"""


def q_emb_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style quantization health profile: each embedding is fixed-
    point quantized (the same exact ``floor((x+2)·10⁶)`` micro-units the
    integer k-means uses), then coarsened to a 129-level scalar code
    (step 31250 µunits ≈ int8 over the ±2 range). The per-component
    reconstruction error of floor coarsening is exactly ``q mod step``,
    so the whole profile — worst component error and total error mass
    per label — is BIGINT arithmetic, identical in both engines. The
    go/no-go check before serving an int8-compressed ANN index: a label
    whose max_err hits step−1 with high sum_err loses ranking fidelity.
    Map-only until one label-sized groupBy."""
    from .operators.similarity import quantize_vec

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    step = F.lit(31250).cast("long")
    errs = F.transform(
        quantize_vec(F.col("embedding")), lambda x: F.pmod(x, step)
    )
    per_vec = emb.select(
        "label",
        F.array_max(errs).alias("_max_err"),
        F.aggregate(
            errs, F.lit(0).cast("long"), lambda acc, e: acc + e
        ).alias("_sum_err"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.max("_max_err").alias("max_err"),
        F.sum("_sum_err").alias("sum_err"),
    )


_O_EMB_QUANT = """
WITH q AS (SELECT label,
        list_transform(CAST(embedding AS DOUBLE[]),
          x -> CAST(floor((x + 2.0) * 1000000.0) AS BIGINT) % 31250) AS errs
      FROM embeddings)
SELECT label,
  CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(max(list_max(errs)) AS BIGINT) AS max_err,
  CAST(sum(list_sum(errs)) AS BIGINT) AS sum_err
FROM q GROUP BY label
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=10)


_O_ANN_TOPK = """
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.q_id, e.vec_id AS n_id,
        list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])) /
        (sqrt(list_dot_product(q.qv, q.qv)) *
         sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])))) AS cos
      FROM q, embeddings e WHERE e.vec_id <> q.q_id),
r AS (SELECT q_id, n_id,
        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
          AS INT) AS rank
      FROM s)
SELECT q_id, n_id, rank FROM r WHERE rank <= 10
"""


_O_ANN_RECALL = f"""
WITH ex AS (SELECT q_id, n_id FROM ({_O_ANN_TOPK}) x WHERE rank <= 5),
ap AS (SELECT q_id, n_id FROM ({_O_ANN_LSH}) y),
h AS (SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.n_id = ap.n_id
      GROUP BY 1),
p AS (SELECT q_id, CAST(count(*) AS BIGINT) AS k_exact FROM ex GROUP BY 1)
SELECT p.q_id, p.k_exact,
  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  CAST(coalesce(h.n_hits, 0) * 100 // p.k_exact AS BIGINT) AS recall_pct
FROM p LEFT JOIN h ON p.q_id = h.q_id
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering end-to-end: MinHash/LSH candidate pairs →
    connected components → one keeper per cluster. The step that turns
    pairwise dedup output into the drop-list a corpus-cleaning pass
    actually applies. Singleton documents are their own component."""
    from .operators.dedup import connected_components

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs)
    return (
        corpus.select("doc_id")
        .join(comp, corpus["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
        .withColumn("is_keeper", F.col("doc_id") == F.col("component"))
    )


_O_DEDUP_COMPONENTS = f"""
WITH RECURSIVE corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
          WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT c.doc_id,
       coalesce(m.component, c.doc_id) AS component,
       (c.doc_id = coalesce(m.component, c.doc_id)) AS is_keeper
FROM corpus c LEFT JOIN comp m ON m.node = c.doc_id
"""


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup (Lee et al. style): maximal word
    spans covered by 8-grams shared across ≥2 documents of the near-dup
    corpus — the passage-level output a span-removal pass consumes."""
    from .operators.dedup import duplicate_ngram_spans

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    return duplicate_ngram_spans(corpus, n=8)


_O_DUP_SPANS = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 8),
g AS (SELECT doc_id, i + 1 AS pos,
        md5(array_to_string(list_slice(w, i + 1, i + 8), ' ')) AS gh
      FROM w, UNNEST(range(0, len(w) - 7)) AS u(i)),
sh AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
d AS (SELECT g.doc_id, g.pos FROM g JOIN sh USING (gh)),
l AS (SELECT doc_id, pos,
        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM d),
b AS (SELECT doc_id, pos,
        CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END AS brk
      FROM l),
i2 AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         ROWS UNBOUNDED PRECEDING) AS island FROM b)
SELECT doc_id,
  CAST(min(pos) AS INT) AS span_start,
  CAST(max(pos) + 7 AS INT) AS span_end,
  CAST(max(pos) + 7 - min(pos) + 1 AS INT) AS span_words,
  CAST(count(*) AS INT) AS n_grams
FROM i2 GROUP BY doc_id, island
"""

# Shared benchmark-set derivation (dialect-neutral): every 17th document
# stands in for the held-out eval set the corpus must be scrubbed against.
_BENCH_SET = "SELECT doc_id, text FROM documents WHERE doc_id % 17 = 3"


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-document 8-gram overlap counts
    against the derived benchmark set + the contaminated verdict."""
    from .operators.dedup import decontaminate

    corpus = _docs(spark, sf_dir)
    bench = _sql_over(spark, sf_dir, _BENCH_SET, "documents")
    return decontaminate(corpus, bench, n=8)


_O_DECONTAM = f"""
WITH bench AS ({_BENCH_SET}),
cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       WHERE len(string_split(text, ' ')) >= 8),
cg AS (SELECT DISTINCT doc_id,
         md5(array_to_string(list_slice(w, i + 1, i + 8), ' ')) AS gh
       FROM cw, UNNEST(range(0, len(w) - 7)) AS u(i)),
bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM bench
       WHERE len(string_split(text, ' ')) >= 8),
bg AS (SELECT DISTINCT
         md5(array_to_string(list_slice(w, i + 1, i + 8), ' ')) AS gh
       FROM bw, UNNEST(range(0, len(w) - 7)) AS u(i)),
ov AS (SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
       FROM cg JOIN bg USING (gh) GROUP BY 1),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM cg GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(tot.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
  (coalesce(ov.n_overlap, 0) > 0) AS contaminated
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN ov ON ov.doc_id = d.doc_id
"""


#: Fixed IVF centroids (4 cells over 64-dim embeddings): deterministic small
#: integers shared verbatim with the DuckDB oracle. A production job ships
#: the output of an offline k-means pass as job args — never RNG in
#: executors.
_IVF_CENTROIDS = [
    [((3 * (i + 1) * j + 5 * i) % 13) - 6 for j in range(64)]
    for i in range(4)
]


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell approximate nearest neighbors: map-side centroid-cell
    assignment, queries probe their 2 best cells, exact cosine within
    probed cells — the centroid-partitioned ANN path next to the sign-LSH
    one (``ann_lsh``) and the brute-force baseline (``ann_topk``)."""
    from .operators.similarity import ivf_topk

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, _IVF_CENTROIDS, k=5, nprobe=2)


def _ivf_score_sql(i: int) -> str:
    c = _plane_sql(_IVF_CENTROIDS[i])
    return (
        f"list_dot_product(v, {c}) / sqrt(list_dot_product({c}, {c}))"
        f" AS s{i}"
    )


_O_ANN_IVF = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v,
        {_ivf_score_sql(0)},
        {_ivf_score_sql(1)},
        {_ivf_score_sql(2)},
        {_ivf_score_sql(3)}
      FROM e),
a AS (SELECT vec_id, v,
        CASE greatest(s0, s1, s2, s3)
          WHEN s3 THEN 3 WHEN s2 THEN 2 WHEN s1 THEN 1 ELSE 0 END AS cell
      FROM s),
qs AS (SELECT vec_id, v, p.ci,
         CASE p.ci WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
              ELSE s3 END AS sc
       FROM s, (VALUES (0), (1), (2), (3)) AS p(ci)
       WHERE vec_id < 5),
qp AS (SELECT vec_id AS q_id, v AS qv, ci AS cell
       FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY sc DESC, ci DESC) AS pr FROM qs) z
       WHERE pr <= 2),
cand AS (SELECT qp.q_id, a.vec_id AS n_id, a.cell,
           list_dot_product(qp.qv, a.v) /
           (sqrt(list_dot_product(qp.qv, qp.qv)) *
            sqrt(list_dot_product(a.v, a.v))) AS cos
         FROM qp JOIN a ON a.cell = qp.cell AND a.vec_id <> qp.q_id),
r AS (SELECT q_id, n_id, cell, CAST(row_number() OVER
        (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rank
      FROM cand)
SELECT q_id, n_id, cell, rank FROM r WHERE rank <= 5
"""


def q_rep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (duplicate-word/bigram counts,
    top-gram counts) as exact integers over the documents table."""
    from .operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


_O_REP_STATS = """
WITH wr AS (SELECT doc_id, u.g AS g
            FROM documents, UNNEST(string_split(text, ' ')) AS u(g)
            WHERE u.g <> ''),
wc AS (SELECT doc_id, g, count(*) AS c FROM wr GROUP BY 1, 2),
wd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct_words,
         CAST(max(c) AS BIGINT) AS top_word_count
       FROM wc GROUP BY 1),
bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       WHERE len(string_split(text, ' ')) >= 2),
br AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g
       FROM bw, UNNEST(range(1, len(w))) AS u(i)),
bc AS (SELECT doc_id, g, count(*) AS c FROM br GROUP BY 1, 2),
bd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(max(c) AS BIGINT) AS top_bigram_count
       FROM bc GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(wd.n_words, 0) AS BIGINT) AS n_words,
  CAST(coalesce(wd.n_distinct_words, 0) AS BIGINT) AS n_distinct_words,
  CAST(coalesce(wd.top_word_count, 0) AS BIGINT) AS top_word_count,
  CAST(coalesce(bd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(bd.n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
  CAST(coalesce(bd.top_bigram_count, 0) AS BIGINT) AS top_bigram_count
FROM documents d
LEFT JOIN wd ON wd.doc_id = d.doc_id
LEFT JOIN bd ON bd.doc_id = d.doc_id
"""


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document, ranked by the
    integer-exact TF-IDF-style key (tf·10⁶ DIV df) — cross-engine
    float-safe ranking."""
    from .operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


_O_TFIDF_TOPTERMS = """
WITH wr AS (SELECT doc_id, u.term AS term
            FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
            WHERE u.term <> ''),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM wr GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        (tf.tf * 1000000) // dfq.df AS score_key
      FROM tf JOIN dfq USING (term)),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         ORDER BY score_key DESC, term) AS INT) AS rank FROM s)
SELECT doc_id, term, tf, df, score_key, rank FROM r WHERE rank <= 3
"""


def q_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus carving: train/val/test split labels plus an
    independent 25% sample flag, both pure functions of (doc_id, seed) —
    reproducible at any parallelism, unlike ``randomSplit``/``sample``."""
    from .operators.sampling import _hex_threshold, hash_split, split_key

    docs = _docs(spark, sf_dir).select("doc_id")
    split = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
    )
    return split.withColumn(
        "in_sample",
        split_key(F.col("doc_id"), seed=7) < F.lit(_hex_threshold(0.25)),
    )


def _o_split_sample() -> str:
    from .operators.sampling import _hex_threshold

    t80, t90, t25 = (
        _hex_threshold(0.8), _hex_threshold(0.9), _hex_threshold(0.25),
    )
    return f"""
WITH k AS (SELECT doc_id,
    substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8) AS k0,
    substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8) AS k7
  FROM documents)
SELECT doc_id,
  CASE WHEN k0 < '{t80}' THEN 'train'
       WHEN k0 < '{t90}' THEN 'val'
       ELSE 'test' END AS split,
  (k7 < '{t25}') AS in_sample
FROM k
"""


def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment + contiguous sequence packing: documents land in 8
    deterministic shards, then each shard's token stream is cut into
    1000-token packs — the corpus → fixed-context-window grouping a
    training loader consumes."""
    from .operators.sampling import pack_contiguous, shard_assign

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_contiguous(
        shard_assign(with_tokens, n_shards=8, seed=0), budget=1000
    )


_O_SHARD_PACK = """
WITH s AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 2) AS h2
  FROM documents),
sh AS (SELECT doc_id, n_tokens,
    CAST((ascii(substr(h2, 1, 1)) * 256 + ascii(substr(h2, 2, 1))) % 8
      AS INT) AS shard
  FROM s),
p AS (SELECT shard, doc_id, n_tokens,
    CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) / 1000.0) AS BIGINT) AS pack_id
  FROM sh)
SELECT shard, doc_id, n_tokens, pack_id,
  CAST(row_number() OVER (PARTITION BY shard, pack_id ORDER BY doc_id) - 1
    AS INT) AS pack_pos
FROM p
"""


#: pack budget shared by the query, its util denominator, and the oracle
#: (a desynced copy would silently report utilization against the wrong
#: denominator). NOTE: _O_SHARD_PACK's windowed pack_id also assumes this
#: value — keep them aligned.
_PACK_BUDGET = 1000


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack manifest: per (shard, pack) document count, token total, and
    integer-ppm budget utilization — the loader-side index a training job
    reads to schedule fixed-context batches (and the direct view of how
    much budget the greedy packing wastes per pack)."""
    from .operators.sampling import pack_contiguous, shard_assign

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_contiguous(
        shard_assign(with_tokens, n_shards=8, seed=0), budget=_PACK_BUDGET
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
        .withColumn(
            "util_ppm",
            F.expr(f"pack_tokens * 1000000 div {_PACK_BUDGET}"),
        )
    )


_O_PACK_MANIFEST = f"""
SELECT shard, pack_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
  CAST(sum(n_tokens) * 1000000 // {_PACK_BUDGET} AS BIGINT) AS util_ppm
FROM ({_O_SHARD_PACK}) sp
GROUP BY shard, pack_id
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of every document into 32-word chunks with
    8 words of overlap — the document → training-sample explode."""
    from .operators.textstats import chunk_text

    return chunk_text(_docs(spark, sf_dir), chunk=32, overlap=8)


_O_DOC_CHUNKS = """
WITH w AS (SELECT doc_id,
    list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
nz AS (SELECT doc_id, w, len(w) AS n FROM w WHERE len(w) > 0),
st AS (SELECT doc_id, w, u.s AS s
       FROM nz, UNNEST(range(1, greatest(n - 8, 1) + 1, 24)) AS u(s))
SELECT doc_id,
  CAST((s - 1) // 24 AS INT) AS chunk_idx,
  array_to_string(list_slice(w, s, s + 31), ' ') AS chunk_text,
  CAST(len(list_slice(w, s, s + 31)) AS INT) AS n_chunk_words
FROM st
"""

# Shared PII-bearing corpus (dialect-neutral): deterministic synthetic
# URLs/emails/phones woven around real document rows, so the redaction
# query exercises every pattern while both engines derive identical input.
_CORPUS_PII = """
  SELECT doc_id,
    'ref https://ex.org/d/' || CAST(doc_id AS STRING)
      || '?u=a@b.co mail bob.smith+' || CAST(doc_id AS STRING)
      || '@mail.example.org call +1 (555) 010-'
      || CAST(doc_id % 100 AS STRING) || '22 end' AS text
  FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a corpus seeded with synthetic URLs, emails, and
    phone numbers: typed placeholder replacement + per-pattern counts."""
    from .operators.textstats import redact_pii

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_PII}) pii", "documents"
    )
    return redact_pii(corpus)


_O_PII_REDACT = f"""
WITH corpus AS ({_CORPUS_PII.replace("AS STRING", "AS VARCHAR")})
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      'https?://[^\\s]+', '<URL>', 'g'),
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
      '\\+?[0-9][0-9 ()-]{{6,}}[0-9]', '<PHONE>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS INT) AS n_url,
  CAST(len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT)
    AS n_email,
  CAST(len(regexp_extract_all(text,
      '\\+?[0-9][0-9 ()-]{{6,}}[0-9]')) AS INT) AS n_phone
FROM corpus
"""


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-token budgeting: BPE-ish regex token counts next to the
    whitespace count, over the punctuation/URL-rich synthetic corpus
    (where the two measures actually diverge)."""
    from .operators.textstats import bpe_token_count

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_PII}) pii", "documents"
    )
    return bpe_token_count(corpus)


def _o_bpe_tokens() -> str:
    from .operators.textstats import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH corpus AS ({_CORPUS_PII.replace("AS STRING", "AS VARCHAR")}),
s AS (SELECT doc_id,
        len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws,
        len(regexp_extract_all(text, '{pat}')) AS bpe
      FROM corpus)
SELECT doc_id,
  CAST(ws AS BIGINT) AS n_ws_tokens,
  CAST(bpe AS BIGINT) AS n_bpe_tokens,
  CAST(CASE WHEN ws > 0 THEN (bpe * 100) // ws END AS BIGINT)
    AS tokens_per_100_words
FROM s
"""


def q_corpus_comp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup: doc/token totals per (language, length
    band), per language, and grand total in one grouping-sets pass."""
    from .operators.textstats import corpus_composition

    strata = _docs_with_lang(spark, sf_dir).select(
        "lang",
        F.when(F.col("n_tokens") < 50, "short")
        .when(F.col("n_tokens") < 200, "medium")
        .otherwise("long")
        .alias("band"),
        "n_tokens",
    )
    return corpus_composition(strata)


_O_CORPUS_COMP = """
WITH h AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('the','and','of','is'))) AS BIGINT) AS hits_en,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('el','la','los','que'))) AS BIGINT) AS hits_es,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('le','la','les','est'))) AS BIGINT) AS hits_fr,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('der','die','und','ist'))) AS BIGINT) AS hits_de
  FROM documents),
strata AS (
  SELECT CASE WHEN hits_de > greatest(hits_en, hits_es, hits_fr) THEN 'de'
              WHEN hits_fr > greatest(hits_en, hits_es) THEN 'fr'
              WHEN hits_es > hits_en THEN 'es'
              ELSE 'en' END AS lang,
         CASE WHEN n_tokens < 50 THEN 'short'
              WHEN n_tokens < 200 THEN 'medium'
              ELSE 'long' END AS band,
         n_tokens
  FROM h)
SELECT lang, band,
  CAST(CASE WHEN lang IS NULL AND band IS NULL THEN 3
            WHEN band IS NULL THEN 1 ELSE 0 END AS INT) AS lvl,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM strata
GROUP BY ROLLUP (lang, band)
"""


#: per-language keep rates for the stratified-sampling query (es falls to
#: the default)
_STRAT_RATES = {"en": 0.5, "fr": 1.0, "de": 0.25}
_STRAT_DEFAULT = 0.1

#: language-prediction CTE shared by the sampling/quantile oracles (the
#: lang_id marker-word heuristic in SQL)
_LANG_CTE = """
h AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('the','and','of','is'))) AS BIGINT) AS hits_en,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('el','la','los','que'))) AS BIGINT) AS hits_es,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('le','la','les','est'))) AS BIGINT) AS hits_fr,
    CAST(len(list_filter(string_split(text, ' '),
         x -> lower(x) IN ('der','die','und','ist'))) AS BIGINT) AS hits_de
  FROM documents),
lp AS (
  SELECT doc_id, n_tokens,
    CASE WHEN hits_de > greatest(hits_en, hits_es, hits_fr) THEN 'de'
         WHEN hits_fr > greatest(hits_en, hits_es) THEN 'fr'
         WHEN hits_es > hits_en THEN 'es'
         ELSE 'en' END AS lang
  FROM h)
"""


def _docs_with_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, lang) in ONE map-side projection — language and
    token count come from the same row, so no self-join of two scans
    (which at 100 TB would be a full shuffle of the corpus for nothing)."""
    from .operators.textstats import lang_id

    docs = _docs(spark, sf_dir).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    return lang_id(docs, keep=("n_tokens",)).select(
        "doc_id", "n_tokens", F.col("pred_lang").alias("lang")
    )


def q_strat_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: per-language deterministic keep rates (50% en,
    100% fr, 25% de, 10% default) over the language-identified corpus."""
    from .operators.sampling import stratified_sample

    return stratified_sample(
        _docs_with_lang(spark, sf_dir),
        _STRAT_RATES,
        default_rate=_STRAT_DEFAULT,
    ).select("doc_id", "lang")


def _o_strat_sample() -> str:
    from .operators.sampling import _hex_threshold

    cases = " ".join(
        f"WHEN '{v}' THEN '{_hex_threshold(r)}'"
        for v, r in sorted(_STRAT_RATES.items())
    )
    return f"""
WITH {_LANG_CTE}
SELECT doc_id, lang FROM lp
WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8) <
      CASE lang {cases} ELSE '{_hex_threshold(_STRAT_DEFAULT)}' END
"""


def q_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-length distribution: exact discrete quantiles
    (p25/p50/p75/p95 as actual data values, integer-only output)."""
    from .operators.sampling import group_quantiles

    return group_quantiles(_docs_with_lang(spark, sf_dir))


_O_LEN_QUANTILES = f"""
WITH {_LANG_CTE},
r AS (SELECT lang, n_tokens AS v,
        row_number() OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS rn
      FROM lp),
c AS (SELECT lang, count(*) AS n FROM lp GROUP BY 1),
t AS (SELECT lang, u.q AS q, CAST(floor(u.qf * (n - 1)) AS BIGINT) AS idx
      FROM c, (VALUES (250, 0.25), (500, 0.5), (750, 0.75), (950, 0.95))
        AS u(q, qf))
SELECT r.lang, CAST(t.q AS INT) AS q, r.v AS value
FROM r JOIN t ON r.lang = t.lang AND r.rn = t.idx
"""


def q_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-tail trim: drop verdict for documents outside
    their language's [p5, p95] token-length band (discrete quantile
    bounds broadcast back onto the corpus)."""
    from .operators.sampling import length_trim

    return length_trim(_docs_with_lang(spark, sf_dir))


_O_LENGTH_TRIM = f"""
WITH {_LANG_CTE},
r AS (SELECT lang, n_tokens AS v,
        row_number() OVER (PARTITION BY lang ORDER BY n_tokens) - 1 AS rn
      FROM lp),
c AS (SELECT lang, count(*) AS n FROM r GROUP BY 1),
t AS (SELECT lang, u.q AS q, CAST(floor(u.qf * (n - 1)) AS BIGINT) AS idx
      FROM c, (VALUES (50, 0.05), (950, 0.95)) AS u(q, qf)),
qv AS (SELECT r.lang, t.q, r.v FROM r JOIN t
       ON r.lang = t.lang AND r.rn = t.idx),
b AS (SELECT lang,
        min(CASE WHEN q = 50 THEN v END) AS lo_v,
        min(CASE WHEN q = 950 THEN v END) AS hi_v
      FROM qv GROUP BY 1)
SELECT lp.doc_id, lp.lang, lp.n_tokens AS value, b.lo_v, b.hi_v,
       (lp.n_tokens >= b.lo_v AND lp.n_tokens <= b.hi_v) AS keep
FROM lp JOIN b ON lp.lang = b.lang
"""


def q_c4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level segment dedup (the removal pass): repeated
    8-word segments keep only their globally-first occurrence; cleaned
    text is reassembled per document."""
    from .operators.dedup import segment_dedup

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    return segment_dedup(corpus, n=8)


_O_C4_LINE_DEDUP = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
seg AS (SELECT doc_id, CAST(i AS INT) AS seg_idx,
          array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' ') AS seg
        FROM w, UNNEST(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS u(i)),
r AS (SELECT doc_id, seg_idx, seg,
        row_number() OVER (PARTITION BY md5(seg)
                           ORDER BY doc_id, seg_idx) AS rn
      FROM seg),
pd AS (SELECT doc_id,
         CAST(count(*) AS INT) AS n_segments,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
         coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                    FILTER (WHERE rn = 1), '') AS clean_text
       FROM r GROUP BY doc_id)
SELECT c.doc_id,
  coalesce(pd.n_segments, 0) AS n_segments,
  coalesce(pd.n_kept, 0) AS n_kept,
  coalesce(pd.n_segments, 0) - coalesce(pd.n_kept, 0) AS n_dropped,
  coalesce(pd.clean_text, '') AS clean_text
FROM corpus c LEFT JOIN pd ON pd.doc_id = c.doc_id
"""


def q_ulm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language LM quality banding over the documents
    corpus: integer-exact unigram inverse-frequency score + head/middle/
    tail terciles per language."""
    from .operators.textstats import lm_quality_bands

    return lm_quality_bands(_docs(spark, sf_dir))


_O_ULM_QUALITY = """
WITH tk AS (SELECT doc_id, lang, u.term AS term
            FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
            WHERE u.term <> ''),
tf AS (SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
       FROM tk GROUP BY 1, 2, 3),
m AS (SELECT lang, term, CAST(sum(tf) AS BIGINT) AS cnt
      FROM tf GROUP BY 1, 2),
sc AS (SELECT tf.doc_id, tf.lang,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         CAST(sum(tf.tf * (1000000000 // m.cnt)) // sum(tf.tf) AS BIGINT)
           AS score_key
       FROM tf JOIN m ON tf.lang = m.lang AND tf.term = m.term
       GROUP BY 1, 2)
SELECT doc_id, lang, n_tokens, score_key,
  CASE ntile(3) OVER (PARTITION BY lang ORDER BY score_key, doc_id)
    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS band
FROM sc
"""


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (α = 0.5) multilingual sampling weights over the
    documents corpus — natural vs temperature token shares in integer ppm
    plus the per-language up-sampling factor."""
    from .operators.sampling import mixture_weights

    return mixture_weights(_docs(spark, sf_dir))


_O_MIX_WEIGHTS = """
WITH pl AS (SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
k AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                AS BIGINT) AS s FROM pl),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        CAST(sum(s) AS BIGINT) AS tot_s FROM k)
SELECT lang, n_docs, n_tokens, p_ppm, w_ppm,
  CASE WHEN p_ppm > 0 THEN CAST(w_ppm * 1000 // p_ppm AS BIGINT) END
    AS up_x1000
FROM (SELECT lang, n_docs, n_tokens,
        -- HUGEINT numerator = Spark's DECIMAL(38,0) widening: the x1e6
        -- multiply must not overflow 64-bit at extreme token counts
        CAST(CAST(n_tokens AS HUGEINT) * 1000000 // tot_tokens AS BIGINT)
          AS p_ppm,
        CAST(CAST(s AS HUGEINT) * 1000000 // tot_s AS BIGINT) AS w_ppm
      FROM k, t) z
"""


def q_mix_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture APPLIED: deterministic hash downsample of
    over-represented languages toward the α = 0.5 shares, reported as the
    per-language attrition table — the one-pass composition of
    mix_weights with the hash sampler (over-represented langs keep a
    ``up_x1000/1000`` slice of the hex space; under-represented keep
    all)."""
    from .operators.sampling import apply_mixture

    return apply_mixture(_docs(spark, sf_dir))


_O_MIX_APPLY = f"""
WITH mw AS ({_O_MIX_WEIGHTS}),
thr AS (SELECT lang, up_x1000,
          CASE WHEN least(coalesce(up_x1000, 1000), 1000) >= 1000 THEN 'g'
               ELSE printf('%08x',
                 least(coalesce(up_x1000, 1000), 1000)
                   * 4294967296 // 1000)
          END AS t
        FROM mw),
k AS (SELECT d.lang, thr.up_x1000,
        CASE WHEN substr(md5(CAST(d.doc_id AS STRING) || ':0'), 1, 8)
             < thr.t THEN 1 ELSE 0 END AS kept,
        len(string_split(d.text, ' ')) AS n_toks
      FROM documents d JOIN thr ON d.lang = thr.lang)
SELECT lang, up_x1000,
  CAST(count(*) AS BIGINT) AS n_docs_in,
  CAST(sum(kept) AS BIGINT) AS n_docs_kept,
  CAST(sum(CASE WHEN kept = 1 THEN n_toks ELSE 0 END) AS BIGINT)
    AS n_tokens_kept
FROM k GROUP BY 1, 2
"""


#: corpus with exact duplicate contents under fresh ids — doc_id % 7 < 2
#: rows are copied verbatim at doc_id + 100000, so their normalized
#: fingerprints collide across (id-dependent) split labels
_CORPUS_EXACT_DUP = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text
  FROM documents WHERE doc_id % 7 < 2
"""


def q_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication profile: histogram of exact-dup cluster sizes over the
    planted-duplicate corpus — cluster size k vs how many clusters have
    that size, plus the redundant-document share each bucket carries
    (integer ppm of the corpus). The one-glance answer to "how duplicated
    is this crawl" that decides whether dedup is worth a full pass. Two
    vocabulary-sized groupBys after the fingerprint aggregate."""
    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_EXACT_DUP}) c", "documents"
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    clusters = (
        corpus.select(F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    total = clusters.agg(F.sum("k").alias("_tot"))
    return (
        clusters.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "n_clusters",
            (F.col("k") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("k") - 1) * F.col("n_clusters")).alias(
                "redundant_docs"
            ),
            F.expr(
                "(k - 1) * n_clusters * 1000000 div _tot"
            ).alias("redundant_ppm"),
        )
    )


_O_DUP_PROFILE = f"""
WITH corpus AS ({_CORPUS_EXACT_DUP}),
cl AS (SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
         AS fp, CAST(count(*) AS BIGINT) AS k
       FROM corpus GROUP BY 1),
t AS (SELECT CAST(sum(k) AS BIGINT) AS tot FROM cl)
SELECT k, CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(k * count(*) AS BIGINT) AS n_docs,
  CAST((k - 1) * count(*) AS BIGINT) AS redundant_docs,
  CAST((k - 1) * count(*) * 1000000 // max(t.tot) AS BIGINT)
    AS redundant_ppm
FROM cl, t GROUP BY k
"""


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: exact-content duplicates whose
    copies land in different train/val/test hash splits — the post-split
    leak list an eval-integrity pass consumes."""
    from .operators.dedup import cross_split_leakage

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_EXACT_DUP}) c", "documents"
    )
    return cross_split_leakage(
        corpus, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
    )


def _o_split_leakage() -> str:
    from .operators.sampling import _hex_threshold

    t80, t90 = _hex_threshold(0.8), _hex_threshold(0.9)
    return f"""
WITH corpus AS ({_CORPUS_EXACT_DUP}),
l AS (SELECT doc_id,
        md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
          AS fingerprint,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
                  < '{t80}' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
                  < '{t90}' THEN 'val'
             ELSE 'test' END AS split
      FROM corpus),
g AS (SELECT fingerprint,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
        array_to_string(list_sort(list(DISTINCT split)), '|') AS splits,
        min(doc_id) AS first_doc
      FROM l GROUP BY fingerprint)
SELECT * FROM g WHERE n_splits >= 2
"""


#: the consolidated record's extracted-value columns (subset of the
#: 13-field catalog materialized as *_value columns) — the coverage unit
_COVERAGE_COLS = (
    "identifier_value", "firstname_value", "lastname_value",
    "courtdate_value", "maincharge_value", "addcharges_value",
    "defsig_value", "offsig_value", "phone_value", "notes_value",
)


def q_field_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-coverage histogram over the consolidated records: how many
    of the extracted-value fields are populated per document, bucketed —
    the completeness report a review queue is prioritized by (the
    reference surfaces the same signal per document as its 5/13 progress
    count, SURVEY row 16; this is the corpus-level rollup). Composes the
    full consolidation fold, then one tiny groupBy over its output."""
    rec = q_consolidate(spark, sf_dir)
    filled = None
    for c in _COVERAGE_COLS:
        e = F.when(F.col(c).isNotNull(), 1).otherwise(0)
        filled = e if filled is None else filled + e
    return (
        rec.select(filled.cast("long").alias("n_filled"))
        .groupBy("n_filled")
        .agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    )


def _o_field_coverage() -> str:
    cases = " + ".join(
        f"(CASE WHEN {c} IS NOT NULL THEN 1 ELSE 0 END)"
        for c in _COVERAGE_COLS
    )
    return f"""
WITH rec AS ({_O_CONSOLIDATE})
SELECT CAST({cases} AS BIGINT) AS n_filled,
       CAST(count(*) AS BIGINT) AS n_records
FROM rec GROUP BY 1
"""


def q_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) curation profile: document/token totals,
    quality-keep share, and intra-source exact-dup share, all integer ppm
    — the per-domain report a crawl pipeline uses to allowlist, throttle,
    or drop whole sources (domain-level pruning acts on exactly these
    aggregates). One scan, one groupBy(source) with map-side combine;
    output cardinality = number of sources."""
    from .operators.textstats import quality_keep

    text = F.col("text")
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    flags = _docs(spark, sf_dir).select(
        "source",
        F.size(F.split(text, " ")).cast("long").alias("n_toks"),
        quality_keep(text).cast("long").alias("qk"),
        F.md5(norm).alias("fp"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("qk").alias("_nk"),
            F.countDistinct("fp").cast("long").alias("_nfp"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("_nk * 1000000 div n_docs").alias("keep_ppm"),
            (F.col("n_docs") - F.col("_nfp")).alias("dup_docs"),
            F.expr("(n_docs - _nfp) * 1000000 div n_docs").alias(
                "dup_ppm"
            ),
        )
    )


_O_SOURCE_PROFILE = """
WITH f AS (SELECT source,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 100000
          AND length(replace(text, ' ', ''))
              / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
          AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
              / length(text) <= 0.30
          AND length(regexp_replace(text, '[^0-9]', '', 'g'))
              / length(text) <= 0.50 THEN 1 ELSE 0 END AS BIGINT) AS qk,
        md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
  CAST(sum(qk) * 1000000 // count(*) AS BIGINT) AS keep_ppm,
  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_docs,
  CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*) AS BIGINT)
    AS dup_ppm
FROM f GROUP BY source
"""


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation attrition report over a corpus with planted
    exact duplicates: raw → quality gate → blocklist screen → exact-dup
    keepers → per-split finals, one compact oracle-checked table."""
    from .operators.sampling import curation_funnel

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_EXACT_DUP}) c", "documents"
    )
    return curation_funnel(
        corpus, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
    )


def _o_curation_funnel() -> str:
    from .operators.sampling import _hex_threshold

    t80, t90 = _hex_threshold(0.8), _hex_threshold(0.9)
    return f"""
WITH corpus AS ({_CORPUS_EXACT_DUP}),
f AS (SELECT doc_id,
        md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
        (len(string_split(text, ' ')) BETWEEN 5 AND 100000
         AND length(replace(text, ' ', ''))
             / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
         AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
             / length(text) <= 0.30
         AND length(regexp_replace(text, '[^0-9]', '', 'g'))
             / length(text) <= 0.50) AS qk,
        (len(list_filter(string_split(lower(text), ' '), x -> x <> '')) = 0
         OR len(list_filter(string_split(lower(text), ' '),
              x -> list_contains(['slow','spam','junk','vector'], x)))
            * 1000000
            < 60001 * len(list_filter(string_split(lower(text), ' '),
                x -> x <> ''))) AS bk
      FROM corpus),
g AS (SELECT fp, min(doc_id) AS doc_id FROM f WHERE qk AND bk
      GROUP BY fp),
sp AS (SELECT CASE
          WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
               < '{t80}' THEN 'train'
          WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
               < '{t90}' THEN 'val'
          ELSE 'test' END AS split
       FROM g)
SELECT 'raw' AS stage, 'all' AS split, CAST(count(*) AS BIGINT) AS n_docs
  FROM f
UNION ALL
SELECT 'quality', 'all',
  CAST(sum(CASE WHEN qk THEN 1 ELSE 0 END) AS BIGINT) FROM f
UNION ALL
SELECT 'blocklist', 'all',
  CAST(sum(CASE WHEN qk AND bk THEN 1 ELSE 0 END) AS BIGINT) FROM f
UNION ALL
SELECT 'dedup', 'all', CAST(count(*) AS BIGINT) FROM g
UNION ALL
SELECT 'final', split, CAST(count(*) AS BIGINT) FROM sp GROUP BY split
"""


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd refinement of IVF centroids over the
    embeddings table: integer-exact assignment + centroid update +
    re-assignment (k = 4, lowest-id seeds), byte-identical at any
    parallelism."""
    from .operators.similarity import kmeans_lloyd

    load_views(spark, sf_dir, "embeddings")
    return kmeans_lloyd(spark.table("embeddings"), k=4, iters=1)


_O_KMEANS_CELLS = """
WITH e AS (SELECT vec_id,
        list_transform(CAST(embedding AS DOUBLE[]),
          x -> CAST(floor((x + 2.0) * 1000000.0) AS BIGINT)) AS qv
      FROM embeddings),
seed AS (SELECT qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
           AS ci
         FROM e ORDER BY vec_id LIMIT 4),
d0 AS (SELECT e.vec_id, s.ci, e.qv,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (e.qv[i] - s.qv[i]) * (e.qv[i] - s.qv[i]))) AS BIGINT)
           AS dist
       FROM e, seed s),
a0 AS (SELECT vec_id, first(ci ORDER BY dist, ci) AS cell, any_value(qv)
         AS qv
       FROM d0 GROUP BY vec_id),
upd AS (SELECT a0.cell, u.i AS dim_i,
          CAST(sum(a0.qv[u.i]) AS BIGINT) AS s,
          CAST(count(*) AS BIGINT) AS n
        FROM a0, UNNEST(range(1, 65)) AS u(i)
        GROUP BY 1, 2),
cent AS (SELECT cell, list(s // n ORDER BY dim_i) AS qv FROM upd
         GROUP BY cell),
c1 AS (SELECT s.ci, coalesce(c.qv, s.qv) AS qv
       FROM seed s LEFT JOIN cent c ON c.cell = s.ci),
d1 AS (SELECT e.vec_id, c.ci,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (e.qv[i] - c.qv[i]) * (e.qv[i] - c.qv[i]))) AS BIGINT)
           AS dist
       FROM e, c1 c)
SELECT vec_id, first(ci ORDER BY dist, ci) AS cell,
       CAST(min(dist) AS BIGINT) AS dist
FROM d1 GROUP BY vec_id
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-to-end (SemDeDup, Abbas et al. 2303.09540):
    k-means cells → within-cell cosine pairs (cell-equi join, never global
    all-pairs) → connected components → keep the member farthest from its
    centroid per cluster. Every stage is integer-exact or an identical-
    order float fold, so the full composition is oracle-checkable."""
    from .operators.similarity import semantic_dedup

    load_views(spark, sf_dir, "embeddings")
    return semantic_dedup(
        spark.table("embeddings"), k=4, iters=1, tau=0.35
    )


_O_SEMANTIC_DEDUP = f"""
WITH RECURSIVE km AS ({_O_KMEANS_CELLS}),
e2 AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM embeddings),
nn AS (SELECT vec_id, CAST(sum(CAST(qv[i] AS HUGEINT) * qv[i]) AS HUGEINT)
         AS n2
       FROM e2, UNNEST(generate_series(1, len(qv))) AS u(i)
       GROUP BY vec_id),
j AS (SELECT e2.vec_id, e2.qv, nn.n2, km.cell
      FROM e2 JOIN km USING (vec_id) JOIN nn USING (vec_id)),
pe AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS na, b.n2 AS nb,
         CAST(a.qv[i] AS HUGEINT) * b.qv[i] AS prod
       FROM j a JOIN j b ON a.cell = b.cell AND a.vec_id < b.vec_id,
            UNNEST(generate_series(1, len(a.qv))) AS u(i)),
pd AS (SELECT id_a, id_b, any_value(na) AS na, any_value(nb) AS nb,
         CAST(sum(prod) AS HUGEINT) AS dt
       FROM pe GROUP BY id_a, id_b),
-- integer-exact quantized cosine: cos >= 0.350 <=> dt > 0 AND
-- dt^2 * 10^6 >= 350^2 * na * nb, all int128 arithmetic
prs AS (SELECT id_a, id_b FROM pd
        WHERE dt > 0
          AND dt * dt * 1000000 >= CAST(122500 AS HUGEINT) * na * nb),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b AS src, id_a AS dst FROM prs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
lab AS (SELECT km.vec_id, km.cell, km.dist,
          coalesce(m.component, km.vec_id) AS component
        FROM km LEFT JOIN comp m ON m.node = km.vec_id),
win AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size,
          first(vec_id ORDER BY dist DESC, vec_id) AS canon_id
        FROM lab GROUP BY component)
SELECT l.vec_id, l.cell, l.component, w.cluster_size, w.canon_id,
       (l.vec_id = w.canon_id) AS is_canon
FROM lab l JOIN win w USING (component)
"""


def q_dedup_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup policy end-to-end: LSH candidate pairs → connected
    components → one canonical document per cluster, chosen by highest
    text length (the keep-longest convention), ties by lowest doc_id."""
    from .operators.dedup import canonical_docs, connected_components

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs)
    scored = corpus.select(
        "doc_id", F.length("text").cast("long").alias("score")
    )
    return canonical_docs(scored, comp)


_O_DEDUP_CANON = f"""
WITH RECURSIVE corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b AS src, id_a AS dst FROM prs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
lab AS (SELECT c.doc_id, coalesce(m.component, c.doc_id) AS component,
          CAST(length(c.text) AS BIGINT) AS score
        FROM corpus c LEFT JOIN comp m ON m.node = c.doc_id),
win AS (SELECT component,
          CAST(count(*) AS BIGINT) AS cluster_size,
          first(doc_id ORDER BY score DESC, doc_id) AS canon_id
        FROM lab GROUP BY component)
SELECT l.doc_id, l.component, w.cluster_size, w.canon_id,
       (l.doc_id = w.canon_id) AS is_canon
FROM lab l JOIN win w ON l.component = w.component
"""


def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-blocklist screen over the documents corpus: per-doc hit
    counts, integer ppm hit ratio, and the keep verdict (C4-style lexical
    filter softened to a ratio threshold)."""
    from .operators.textstats import blocklist_hits

    return blocklist_hits(_docs(spark, sf_dir))


_O_BLOCKLIST = """
WITH t AS (SELECT doc_id,
        list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents),
c AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks,
          x -> list_contains(['slow','spam','junk','vector'], x)))
          AS BIGINT) AS hits,
        CAST(len(list_intersect(list_distinct(toks),
          ['slow','spam','junk','vector'])) AS BIGINT) AS distinct_hits
      FROM t)
SELECT doc_id, n_tokens, hits, distinct_hits,
  CAST(CASE WHEN n_tokens > 0 THEN hits * 1000000 // n_tokens
       ELSE 0 END AS BIGINT) AS hit_ppm,
  (CASE WHEN n_tokens > 0 THEN hits * 1000000 // n_tokens
   ELSE 0 END) <= 60000 AS keep
FROM c
"""


def q_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary/Zipf profile: token totals, vocab size,
    hapax count, and the dominant term with its integer ppm share."""
    from .operators.textstats import zipf_stats

    return zipf_stats(_docs(spark, sf_dir))


_O_ZIPF_STATS = """
WITH tk AS (SELECT lang, u.term FROM documents,
        UNNEST(string_split(text, ' ')) AS u(term) WHERE u.term <> ''),
pt AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
       FROM tk GROUP BY 1, 2),
top AS (SELECT lang, term AS top_term, cnt AS top_cnt,
          row_number() OVER (PARTITION BY lang
                             ORDER BY cnt DESC, term) AS rn
        FROM pt),
agg AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          CAST(count(*) AS BIGINT) AS vocab,
          CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        FROM pt GROUP BY 1)
SELECT a.lang, a.n_tokens, a.vocab, a.hapax, t.top_term, t.top_cnt,
  CAST(t.top_cnt * 1000000 // a.n_tokens AS BIGINT) AS top_share_ppm
FROM agg a JOIN top t ON a.lang = t.lang AND t.rn = 1
"""


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM familiarity over the documents corpus: integer-exact
    tf-weighted mean conditional bigram probability (ppm) per document,
    under a per-language model trained on the corpus itself."""
    from .operators.textstats import bigram_familiarity

    return bigram_familiarity(_docs(spark, sf_dir))


_O_BIGRAM_LM = """
WITH t AS (SELECT doc_id, lang,
        list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
bi AS (SELECT doc_id, lang, toks[i + 1] AS w1, toks[i + 2] AS w2
       FROM t, UNNEST(range(0, len(toks) - 1)) AS u(i)
       WHERE len(toks) >= 2),
tf AS (SELECT doc_id, lang, w1, w2, CAST(count(*) AS BIGINT) AS tf
       FROM bi GROUP BY 1, 2, 3, 4),
m AS (SELECT lang, w1, w2, CAST(sum(tf) AS BIGINT) AS cnt
      FROM tf GROUP BY 1, 2, 3),
p AS (SELECT lang, w1, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM m GROUP BY 1, 2)
SELECT tf.doc_id, tf.lang,
  CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
  CAST(sum(tf.tf * (m.cnt * 1000000 // p.pcnt)) // sum(tf.tf) AS BIGINT)
    AS familiarity_ppm
FROM tf
JOIN m ON tf.lang = m.lang AND tf.w1 = m.w1 AND tf.w2 = m.w2
JOIN p ON tf.lang = p.lang AND tf.w1 = p.w1
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Registry + driver entry
# ---------------------------------------------------------------------------

# Dict order matters: the driver's CORRECTNESS gate records only the FIRST
# 50 entries (round-3 finding).  The 30 ops the round-3 driver file never
# recorded lead here; the extraction/consolidate/streaming core — already
# driver-green in rounds 1-3 AND pinned by the pytest e2e suite — sits in
# the tail.
def q_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT example construction: each assistant turn packed with its
    preceding 3 turns as `role: text` context lines — the supervised
    fine-tuning example shape, built with one bounded-frame window under
    the conversation partitioning (state O(k) per row regardless of
    conversation length)."""
    from .operators.examples import sft_pack_examples

    return sft_pack_examples(spark_transcripts(spark, sf_dir))


_O_SFT_EXAMPLES = oracle_cte("""
SELECT conv_id, turn_idx,
  CAST(n_context_turns AS BIGINT) AS n_context_turns,
  CAST(length(context_text) AS BIGINT) AS context_chars,
  CAST(length(coalesce(text, '')) AS BIGINT) AS target_chars,
  context_text
FROM (
  SELECT conv_id, turn_idx, role, text,
    count(*) OVER w AS n_context_turns,
    string_agg(role || ': ' || coalesce(text, ''), chr(10)) OVER w
      AS context_text
  FROM t
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
) x
WHERE role = 'assistant' AND n_context_turns > 0
""")


def q_extractiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Response copy-ratio: fraction of each assistant turn's distinct
    tokens already present in the preceding turn — the extractiveness /
    echo-response signal. One lag window + map-only array arithmetic;
    the ratio is one division of exact BIGINTs."""
    from .operators.examples import extractiveness

    return extractiveness(spark_transcripts(spark, sf_dir))


_O_EXTRACTIVENESS = oracle_cte("""
, lagd AS (
  SELECT conv_id, turn_idx, role, text,
    lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
  FROM t
),
toksets AS (
  SELECT conv_id, turn_idx,
    list_filter(list_distinct(string_split_regex(lower(coalesce(text, '')),
                '[^a-z0-9]+')), x -> x <> '') AS ct,
    list_filter(list_distinct(string_split_regex(lower(prev_text),
                '[^a-z0-9]+')), x -> x <> '') AS pt
  FROM lagd WHERE role = 'assistant' AND prev_text IS NOT NULL
)
SELECT conv_id, turn_idx,
  CAST(len(ct) AS BIGINT) AS n_tokens,
  CAST(len(list_intersect(ct, pt)) AS BIGINT) AS n_shared,
  CASE WHEN len(ct) > 0
       THEN CAST(len(list_intersect(ct, pt)) AS DOUBLE) / len(ct)
  END AS copy_ratio
FROM toksets
""")


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fit, one merge round: top-20 adjacent character pairs
    by corpus frequency (Sennrich BPE). The explode runs over the
    vocabulary, never the corpus — the corpus collapses to word
    frequencies first."""
    from .operators.textstats import bpe_merge_candidates

    return bpe_merge_candidates(_docs(spark, sf_dir))


_O_BPE_MERGES = """
WITH wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents) x
  WHERE length(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, n
  FROM (SELECT w, n, unnest(range(1, length(w))) AS i FROM wf) y
),
counts AS (
  SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY pair
)
SELECT merge_rank, pair, n_occurrences FROM (
  SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair)
         AS INT) AS merge_rank, pair, n_occurrences
  FROM counts) z
WHERE merge_rank <= 20
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection weights: hashed-unigram bucket counts
    for the target domain (source = src0) vs the raw corpus, summed per
    document — the importance-resampling score for domain-targeted
    mixes. The 256-row bucket model is a broadcast-class artifact; the
    corpus aggregates under one doc-grain shuffle."""
    from .operators.textstats import dsir_affinity

    return dsir_affinity(_docs(spark, sf_dir), F.col("source") == "src0")


_O_DSIR_WEIGHTS = """
WITH g AS (
  SELECT doc_id, is_t, substr(md5(w), 1, 2) AS b FROM (
    SELECT doc_id, source = 'src0' AS is_t,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
    FROM documents) x
  WHERE length(w) >= 2
),
model AS (
  SELECT b,
    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
    CAST(count(*) AS BIGINT) AS n_raw
  FROM g GROUP BY b
)
SELECT g.doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(m.n_target) AS BIGINT) AS sum_target,
  CAST(sum(m.n_raw) AS BIGINT) AS sum_raw,
  CAST(sum(m.n_target) AS DOUBLE) / sum(m.n_raw) AS affinity
FROM g JOIN model m ON g.b = m.b
GROUP BY g.doc_id
"""


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity per source for n=1..3 — the template-spam /
    Self-BLEU-family corpus-health profile. One corpus pass; the exact
    distinct count shuffles on (source, n, gram) with map-side partials,
    so a dominant source spreads by gram."""
    from .operators.textstats import ngram_diversity

    return ngram_diversity(_docs(spark, sf_dir))


_O_NGRAM_DIVERSITY = """
WITH toks AS (
  SELECT source, list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''
         ) AS tk
  FROM documents
),
grams AS (
  SELECT source, n,
    unnest(list_transform(range(1, len(tk) - n + 2),
      i -> array_to_string(list_slice(tk, CAST(i AS INT),
                                      CAST(i AS INT) + n - 1), ' '))
    ) AS gram
  FROM toks CROSS JOIN (SELECT unnest([1, 2, 3]) AS n) ns
)
SELECT source AS grp, CAST(n AS INT) AS n,
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
  CAST((count(DISTINCT gram) * 1000000) // count(*) AS BIGINT)
    AS diversity_ppm
FROM grams GROUP BY 1, 2
"""


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve over doc_id order in 10
    buckets — cumulative distinct terms vs cumulative token occurrences,
    the crawl-saturation signal. Terms bucket at their FIRST occurrence
    (min doc_id, map-side combinable); cumulative sums run over the
    10-row result only."""
    from .operators.textstats import heaps_law

    return heaps_law(_docs(spark, sf_dir))


_O_HEAPS_LAW = """
WITH words AS (
  SELECT doc_id AS _id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS w
  FROM documents
),
mx AS (SELECT max(doc_id) AS m FROM documents),
tokb AS (
  SELECT CAST(CASE WHEN m <= 922337203685477580
              THEN (_id * 10) // (m + 1)
              ELSE _id // ((m // 10) + 1) END AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM words, mx GROUP BY 1
),
firsts AS (SELECT w, min(_id) AS _id FROM words GROUP BY 1),
newb AS (
  SELECT CAST(CASE WHEN m <= 922337203685477580
              THEN (_id * 10) // (m + 1)
              ELSE _id // ((m // 10) + 1) END AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_new_terms
  FROM firsts, mx GROUP BY 1
),
j AS (
  SELECT bucket,
    CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
    CAST(coalesce(n_new_terms, 0) AS BIGINT) AS n_new_terms
  FROM tokb FULL JOIN newb USING (bucket)
)
SELECT bucket, n_tokens, n_new_terms,
  CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
  CAST(sum(n_new_terms) OVER (ORDER BY bucket) AS BIGINT) AS cum_terms
FROM j
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word and chars per token, from exact BIGINT sums — the tokenizer-
    equity report. Map-only per-doc counts, one bounded groupBy(lang)."""
    from .operators.textstats import tokenizer_fertility

    return tokenizer_fertility(_docs(spark, sf_dir))


def _o_tokenizer_fertility() -> str:
    from .operators.textstats import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH s AS (
  SELECT lang,
    len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws,
    len(regexp_extract_all(text, '{pat}')) AS bpe,
    length(text) AS ch
  FROM documents
)
SELECT lang AS grp,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ws) AS BIGINT) AS n_words,
  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
  CAST(sum(ch) AS BIGINT) AS n_chars,
  CAST(CASE WHEN sum(ws) > 0
       THEN (sum(bpe) * 100) // sum(ws) END AS BIGINT) AS fertility_cpct,
  CAST(CASE WHEN sum(bpe) > 0
       THEN (sum(ch) * 100) // sum(bpe) END AS BIGINT)
    AS chars_per_token_cpct
FROM s GROUP BY lang
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release-risk profile over the (source, lang,
    length-band) quasi-identifier: documents in QI-groups too small to
    hide in. Two map-side-combinable aggregations."""
    from .operators.sampling import k_anonymity

    return k_anonymity(_docs(spark, sf_dir))


_O_K_ANONYMITY = """
WITH g AS (
  SELECT source, lang, n_chars // 256 AS band,
         CAST(count(*) AS BIGINT) AS k
  FROM documents GROUP BY 1, 2, 3
)
SELECT CASE WHEN k = 1 THEN 'unique' WHEN k < 5 THEN 'rare'
            WHEN k < 10 THEN 'small' ELSE 'anonymous' END AS risk_band,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(k) AS BIGINT) AS n_docs
FROM g GROUP BY 1
"""


def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering with exact round-robin source interleaving:
    per-source easiest-first rank via the skew-safe value-histogram
    shape, global position CLOSED-FORM from broadcast per-source totals
    — no global sort, no per-source full sort. curriculum_pos is a
    permutation of 1..N."""
    from .operators.sampling import curriculum_order

    return curriculum_order(_docs(spark, sf_dir))


_O_CURRICULUM = """
WITH below AS (
  SELECT source, n_chars AS v,
    CAST(coalesce(sum(count(*)) OVER (
      PARTITION BY source ORDER BY n_chars
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS below
  FROM documents GROUP BY source, n_chars
),
ranked AS (
  SELECT d.doc_id, d.source,
    CAST(b.below + row_number() OVER (
      PARTITION BY d.source, d.n_chars ORDER BY d.doc_id) AS BIGINT)
      AS src_rank
  FROM documents d
  JOIN below b ON b.source = d.source AND b.v = d.n_chars
),
cnts AS (SELECT source AS cs, CAST(count(*) AS BIGINT) AS cn
         FROM documents GROUP BY 1)
SELECT r.doc_id, r.source, r.src_rank,
  CAST(1 + sum(least(c.cn, r.src_rank - 1)
    + CASE WHEN c.cs < r.source AND c.cn >= r.src_rank
           THEN 1 ELSE 0 END) AS BIGINT) AS curriculum_pos
FROM ranked r CROSS JOIN cnts c
GROUP BY r.doc_id, r.source, r.src_rank
"""


def q_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n / rejection-sampling selection: per conversation, the
    assistant turn maximizing the lexicographic (distinct-token count,
    char length, earliest-turn) reward proxy — ONE max(struct) aggregate,
    map-side combinable, no window."""
    from .operators.examples import best_of_n

    return best_of_n(spark_transcripts(spark, sf_dir))


_O_BEST_OF_N = oracle_cte("""
, cand AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(list_distinct(
      string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+')),
      x -> x <> '')) AS BIGINT) AS n_tok,
    CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
  FROM t WHERE role = 'assistant'
),
r AS (
  SELECT conv_id, turn_idx, n_tok, n_chars,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY n_tok DESC, n_chars DESC, turn_idx) AS rn,
    CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_candidates
  FROM cand
)
SELECT conv_id, n_candidates, CAST(turn_idx AS INT) AS turn_idx,
  n_tok AS reward_tokens, n_chars AS target_chars
FROM r WHERE rn = 1
""")


def q_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline as ONE composed plan — the
    answer to "do the operators actually compose?": normalize →
    Gopher-quality gate → exact-dedup keepers → temperature-mixture
    downsample → shard assignment → contiguous packing → pack manifest.

    Scale shape of the composition: normalization/quality are map-only
    expressions fused into the scan; dedup is one fingerprint aggregate
    + an AQE-decided join (the skew-robust shape, see dedup_weights);
    the mixture weights branch computes on the POST-QUALITY corpus
    (``weights_from``) so it re-executes a map-only scan, not the dedup
    subtree; the pack window partitions by shard and the manifest
    groupBy(shard, pack_id) REUSES that partitioning (subset rule — no
    extra Exchange, same argument as consolidate's fold).

    The normalized+quality projection is checkpointed LAZILY (the
    curation_funnel pattern): FOUR plan branches consume it (dedup
    probe, keeper aggregate, weights per-lang aggregate, weights
    totals), and without the checkpoint each re-runs the two
    normalization regexes over the full text — measured 4× the regex
    cost at 18.8M docs. With it, the regex pass happens once and every
    branch reads the materialized (doc_id, lang, text) rows; plan
    construction stays free (lazy), and an audit check pins the
    downstream plan to ZERO parquet re-scans.

    Returns ``(shard, pack_id, n_docs, n_tokens)``.
    """
    from .operators.sampling import (
        mixture_kept,
        pack_contiguous,
        shard_assign,
    )
    from .operators.textstats import normalize_text, quality_keep

    docs = _docs(spark, sf_dir)
    norm = normalize_text(docs, keep=("lang",)).select(
        "doc_id", "lang", F.col("text_clean").alias("text")
    )
    qual = norm.filter(quality_keep(F.col("text"))).localCheckpoint(
        eager=False
    )
    hashed = qual.withColumn("_fp", F.md5("text"))
    keepers = hashed.groupBy("_fp").agg(F.min("doc_id").alias("_keeper"))
    deduped = (
        hashed.join(keepers, "_fp")
        .filter(F.col("doc_id") == F.col("_keeper"))
        .select("doc_id", "lang", "text")
    )
    final = mixture_kept(deduped, weights_from=qual).filter(
        F.col("kept") == 1
    )
    sized = final.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_contiguous(shard_assign(sized, n_shards=8), budget=1000)
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


_O_CURATE_PIPELINE = r"""
WITH norm AS (
  SELECT doc_id, lang,
    trim(regexp_replace(
      regexp_replace(text, '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
      '[ \t\n\r\f\x0B]+', ' ', 'g')) AS text
  FROM documents
),
q AS (
  SELECT * FROM norm WHERE
    len(string_split(text, ' ')) BETWEEN 5 AND 100000
    AND length(replace(text, ' ', ''))
        / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0
    AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
        / length(text) <= 0.30
    AND length(regexp_replace(text, '[^0-9]', '', 'g'))
        / length(text) <= 0.50
),
kp AS (SELECT md5(text) AS fp, min(doc_id) AS keeper FROM q GROUP BY 1),
d AS (SELECT q.* FROM q JOIN kp ON md5(q.text) = kp.fp
      WHERE q.doc_id = kp.keeper),
pl AS (SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         AS n_tokens FROM q GROUP BY 1),
k2 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
         AS BIGINT) AS s FROM pl),
tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         CAST(sum(s) AS BIGINT) AS tot_s FROM k2),
mw AS (SELECT lang,
         CASE WHEN p_ppm > 0 THEN CAST(w_ppm * 1000 // p_ppm AS BIGINT)
         END AS up_x1000
       FROM (SELECT lang,
               CAST(CAST(n_tokens AS HUGEINT) * 1000000 // tot_tokens
                 AS BIGINT) AS p_ppm,
               CAST(CAST(s AS HUGEINT) * 1000000 // tot_s AS BIGINT)
                 AS w_ppm
             FROM k2, tt) z),
thr AS (SELECT lang,
          CASE WHEN least(coalesce(up_x1000, 1000), 1000) >= 1000 THEN 'g'
               ELSE printf('%08x',
                 least(coalesce(up_x1000, 1000), 1000)
                   * 4294967296 // 1000)
          END AS t
        FROM mw),
fin AS (
  SELECT d.doc_id,
    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
    substr(md5(CAST(d.doc_id AS VARCHAR) || ':0'), 1, 2) AS h2
  FROM d JOIN thr ON d.lang = thr.lang
  WHERE substr(md5(CAST(d.doc_id AS STRING) || ':0'), 1, 8) < thr.t
),
sh AS (SELECT doc_id, n_tokens,
    CAST((ascii(substr(h2, 1, 1)) * 256 + ascii(substr(h2, 2, 1))) % 8
      AS INT) AS shard
  FROM fin),
p AS (SELECT shard, doc_id, n_tokens,
    CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) / 1000.0) AS BIGINT) AS pack_id
  FROM sh)
SELECT shard, pack_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM p GROUP BY 1, 2
"""


def q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-dedup loss weights: every doc kept, weight_ppm = 1e6 DIV
    exact-dup cluster size — repeated content contributes one document's
    gradient in total. Fingerprint sizes join back under AQE (both sides
    corpus-cardinality, no forced broadcast)."""
    from .operators.dedup import dedup_weights

    return dedup_weights(_docs(spark, sf_dir))


_O_DEDUP_WEIGHTS = """
WITH sizes AS (
  SELECT md5(coalesce(text, '')) AS fp, CAST(count(*) AS BIGINT) AS n_copies
  FROM documents GROUP BY 1
)
SELECT d.doc_id, s.n_copies,
  CAST(1000000 // s.n_copies AS BIGINT) AS weight_ppm
FROM documents d JOIN sizes s ON md5(coalesce(d.text, '')) = s.fp
"""


def q_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-budget truncation: keep each conversation's largest
    suffix of turns fitting a 256-token budget (drop earliest first) —
    one running-sum window ordered turn_idx DESC under the conversation
    partitioning."""
    from .operators.examples import context_window_fit

    return context_window_fit(spark_transcripts(spark, sf_dir))


_O_CONTEXT_FIT = oracle_cte("""
, toks AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
      x -> x <> '')) AS BIGINT) AS n_tokens
  FROM t
),
cum AS (
  SELECT conv_id, turn_idx, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens_from_end
  FROM toks
)
SELECT conv_id, turn_idx, n_tokens, cum_tokens_from_end
FROM cum WHERE cum_tokens_from_end <= 256
""")


def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization with exact attrition accounting: control-char
    strip, whitespace-run collapse, trim — map-only, explicit regex
    classes replayed identically by the oracle."""
    from .operators.textstats import normalize_text

    return normalize_text(_docs(spark, sf_dir))


_O_NORMALIZE = r"""
WITH c AS (
  SELECT doc_id,
    trim(regexp_replace(
      regexp_replace(text, '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
      '[ \t\n\r\f\x0B]+', ' ', 'g')) AS text_clean,
    length(text) AS raw_len
  FROM documents
)
SELECT doc_id,
  CAST(raw_len AS BIGINT) AS n_chars_raw,
  CAST(length(text_clean) AS BIGINT) AS n_chars_clean,
  CAST(raw_len - length(text_clean) AS BIGINT) AS n_removed,
  text_clean
FROM c
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: per query vector, top-5 nearest neighbors
    with a DIFFERENT label — the contrastive-training negatives a
    dual-encoder needs (DPR 2004.04906). Exact small-query baseline;
    the corpus path is lsh_topk with the label filter in the bucket
    join."""
    from .operators.similarity import hard_negatives

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 10), k=5)


_O_HARD_NEGATIVES = """
WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                  CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
s AS (SELECT q.q_id, q.q_label, e.vec_id AS n_id, e.label AS n_label,
        list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])) /
        (sqrt(list_dot_product(q.qv, q.qv)) *
         sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])))) AS cos
      FROM q, embeddings e WHERE e.label <> q.q_label),
r AS (SELECT q_id, q_label, n_id, n_label,
        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
          AS INT) AS rank
      FROM s)
SELECT q_id, q_label, n_id, n_label, rank FROM r WHERE rank <= 5
"""


def q_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair (chosen, rejected) construction per conversation
    under the deterministic reward proxy — the RLHF/DPO training-pair
    layout. ONE groupBy carrying max(struct) AND min(struct), both
    map-side combinable; no window."""
    from .operators.examples import preference_pairs

    return preference_pairs(spark_transcripts(spark, sf_dir))


_O_PREF_PAIRS = oracle_cte("""
, cand AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(list_distinct(
      string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+')),
      x -> x <> '')) AS BIGINT) AS n_tok,
    CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
  FROM t WHERE role = 'assistant'
),
r AS (
  SELECT conv_id, turn_idx, n_tok,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY n_tok DESC, n_chars DESC, turn_idx) AS rhi,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY n_tok ASC, n_chars ASC, turn_idx DESC) AS rlo,
    CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_candidates
  FROM cand
)
SELECT hi.conv_id, hi.n_candidates,
  CAST(hi.turn_idx AS INT) AS chosen_turn,
  CAST(lo.turn_idx AS INT) AS rejected_turn,
  hi.n_tok AS chosen_tokens,
  lo.n_tok AS rejected_tokens,
  CAST(hi.n_tok - lo.n_tok AS BIGINT) AS reward_gap_tokens
FROM (SELECT * FROM r WHERE rhi = 1) hi
JOIN (SELECT * FROM r WHERE rlo = 1) lo ON hi.conv_id = lo.conv_id
WHERE hi.n_candidates >= 2
""")


def q_bt_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over the transcript corpus:
    assistant turns carry a deterministic responder variant
    (``'m' || doc_id % 3``); consecutive assistant turns in a
    conversation form a match (longer response wins, ties to the
    earlier turn), and two integer-exact MM updates fit one strength
    per variant. One corpus shuffle (the match-count groupBy); the MM
    iterations run on the bounded variant set only."""
    from .operators.preference import assistant_matches, bt_strength

    t = spark_transcripts(spark, sf_dir).withColumn(
        "variant",
        F.concat(F.lit("m"), (F.col("doc_id") % 3).cast("string")),
    )
    return bt_strength(assistant_matches(t), iters=2)


def _o_bt_iter(prev_s: str, idx: int) -> str:
    """One unrolled MM update (+ renormalization) in oracle SQL."""
    return f"""
d{idx} AS (SELECT p.i AS variant,
         CAST(sum(CAST(p.n_ij AS HUGEINT) * 1000000 // (si.s + sj.s))
           AS BIGINT) AS denom
       FROM pairs p JOIN {prev_s} si ON si.variant = p.i
                    JOIN {prev_s} sj ON sj.variant = p.j
       GROUP BY 1),
r{idx} AS (SELECT it.variant,
         CAST(CAST(it.n_wins AS HUGEINT) * 1000000 //
              greatest(d{idx}.denom, 1) AS BIGINT) AS s_raw
       FROM items it JOIN d{idx} ON d{idx}.variant = it.variant),
t{idx} AS (SELECT CAST(sum(s_raw) AS BIGINT) AS tot,
              CAST(count(*) AS BIGINT) AS k FROM r{idx}),
s{idx} AS (SELECT r{idx}.variant,
         CAST(CAST(r{idx}.s_raw AS HUGEINT) * (t{idx}.k * 1000000)
           // t{idx}.tot AS BIGINT) AS s
       FROM r{idx}, t{idx})"""


_O_BT_STRENGTH = oracle_cte(f"""
, a AS (
  SELECT conv_id, turn_idx,
    'm' || CAST(doc_id % 3 AS STRING) AS v1,
    length(coalesce(text, '')) AS l1
  FROM t WHERE role = 'assistant'
),
nx AS (
  SELECT v1, l1,
    lead(v1) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS v2,
    lead(l1) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS l2
  FROM a
),
m AS (
  SELECT CASE WHEN l1 >= l2 THEN v1 ELSE v2 END AS winner,
         CASE WHEN l1 >= l2 THEN v2 ELSE v1 END AS loser
  FROM nx WHERE v2 IS NOT NULL AND v1 <> v2
),
dm AS (SELECT winner, loser, CAST(count(*) AS BIGINT) AS n
       FROM m GROUP BY 1, 2),
pairs AS (
  SELECT i, j, CAST(sum(n) AS BIGINT) AS n_ij FROM (
    SELECT winner AS i, loser AS j, n FROM dm
    UNION ALL
    SELECT loser AS i, winner AS j, n FROM dm) u
  GROUP BY 1, 2
),
wins AS (SELECT winner AS variant, CAST(sum(n) AS BIGINT) AS n_wins
         FROM dm GROUP BY 1),
im AS (SELECT i AS variant, CAST(sum(n_ij) AS BIGINT) AS n_matches
       FROM pairs GROUP BY 1),
items AS (
  SELECT im.variant, im.n_matches,
         CAST(coalesce(w.n_wins, 0) AS BIGINT) AS n_wins
  FROM im LEFT JOIN wins w ON w.variant = im.variant
),
s0 AS (SELECT variant, CAST(1000000 AS BIGINT) AS s FROM items),
{_o_bt_iter("s0", 1)},
{_o_bt_iter("s1", 2)}
SELECT it.variant, it.n_matches, it.n_wins, s2.s AS strength_ppm
FROM items it JOIN s2 ON s2.variant = it.variant
""")


#: deterministic refusal-marker injection for the refusal_rate twin pair
#: (the synthetic corpus contains no natural refusals; both engines
#: prepend identical markers on identical modular conditions — the same
#: construction style as the transcript field lines)
_REFUSAL_PREFIX_SQL = """CASE WHEN doc_id % 13 = 2
      THEN 'I cannot help with that. '
      WHEN doc_id % 17 = 5
      THEN 'I''m sorry, but I can''t assist with this request. '
      ELSE '' END"""


def q_refusal_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refusal/deflection rate of assistant turns per conversation —
    the transcript-quality gate that keeps deflection-heavy
    conversations out of SFT. Map-only regex flag + one conv-grain
    groupBy."""
    from .operators.textstats import refusal_stats

    t = spark_transcripts(spark, sf_dir).filter(
        F.col("role") == "assistant"
    )
    aug = t.withColumn(
        "text",
        F.concat(
            F.expr(_REFUSAL_PREFIX_SQL), F.coalesce("text", F.lit(""))
        ),
    )
    return refusal_stats(aug, group_col="conv_id")


_O_REFUSAL_RATE = oracle_cte(f"""
, a AS (
  SELECT conv_id,
    {_REFUSAL_PREFIX_SQL} || coalesce(text, '') AS text
  FROM t WHERE role = 'assistant'
)
SELECT conv_id AS grp,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN regexp_matches(lower(text),
    'i cannot help|i can.t assist|i am unable to') THEN 1 ELSE 0 END)
    AS BIGINT) AS n_refusals,
  CAST(sum(CASE WHEN regexp_matches(lower(text),
    'i cannot help|i can.t assist|i am unable to') THEN 1 ELSE 0 END)
    * 1000000 // count(*) AS BIGINT) AS refusal_ppm
FROM a GROUP BY 1
""")


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty of the non-reference corpus slice
    against the reference slice (``doc_id % 10 = 0``) — how much of
    each candidate document is genuinely new. Distinct gram hashes
    map-side, one AQE-decided vocabulary join, doc-grain groupBy."""
    from .operators.dedup import ngram_novelty

    return ngram_novelty(
        _docs(spark, sf_dir), F.col("doc_id") % 10 == 0, n=3
    )


_O_NGRAM_NOVELTY = """
WITH g AS (
  SELECT doc_id, is_ref,
    unnest(list_distinct(list_transform(
      range(1, len(tk) - 1),
      i -> CAST(('0x' || substring(md5(array_to_string(
             list_slice(tk, CAST(i AS INT), CAST(i AS INT) + 2), ' ')),
             1, 15)) AS BIGINT)
    ))) AS gh
  FROM (SELECT doc_id, (doc_id % 10 = 0) AS is_ref,
          string_split(text, ' ') AS tk
        FROM documents) x
),
ref AS (SELECT DISTINCT gh FROM g WHERE is_ref),
c AS (
  SELECT g.doc_id, CASE WHEN r.gh IS NULL THEN 1 ELSE 0 END AS unseen
  FROM g LEFT JOIN ref r ON r.gh = g.gh
  WHERE NOT g.is_ref
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(unseen) AS BIGINT) AS n_unseen,
  CAST((sum(unseen) * 1000000) // count(*) AS BIGINT) AS novelty_ppm
FROM c GROUP BY 1
"""


def q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch sampling plan per language: whole epochs + fractional
    remainder from the temperature-mixture up-sampling factor, priced in
    tokens. Same bounded shape as mix_weights."""
    from .operators.sampling import epoch_schedule

    return epoch_schedule(_docs(spark, sf_dir))


_O_EPOCH_SCHEDULE = f"""
WITH mw AS ({_O_MIX_WEIGHTS})
SELECT lang, n_docs, n_tokens,
  CAST(coalesce(up_x1000, 1000) AS BIGINT) AS up_x1000,
  CAST(coalesce(up_x1000, 1000) // 1000 AS BIGINT) AS full_epochs,
  CAST(coalesce(up_x1000, 1000) % 1000 AS BIGINT) AS frac_x1000,
  CAST(CAST(n_tokens AS HUGEINT) * coalesce(up_x1000, 1000) // 1000
    AS BIGINT) AS planned_tokens
FROM mw
"""


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: corpus vectors within cosine
    0.2 of any benchmark vector (``vec_id % 40 = 7``) inside shared
    sign-LSH buckets — the semantic twin of the n-gram ``decontam``
    scrub. Cross-set bucket equi-join only, never all-pairs."""
    from .operators.similarity import cross_set_screen

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    bench = emb.filter(F.col("vec_id") % 40 == 7)
    corpus = emb.filter(F.col("vec_id") % 40 != 7)
    return cross_set_screen(corpus, bench, _ANN_PLANES, tau=0.2)


_O_SEMANTIC_DECONTAM = f"""
{_ANN_BUCKET_CTE},
bench AS (SELECT vec_id, v, bucket FROM b WHERE vec_id % 40 = 7),
corp AS (SELECT vec_id, v, bucket FROM b WHERE vec_id % 40 <> 7),
hits AS (
  SELECT c.vec_id
  FROM corp c JOIN bench p ON c.bucket = p.bucket
  WHERE list_dot_product(c.v, p.v) /
        (sqrt(list_dot_product(c.v, c.v)) *
         sqrt(list_dot_product(p.v, p.v))) >= 0.2
)
SELECT vec_id, CAST(count(*) AS BIGINT) AS n_probe_hits
FROM hits GROUP BY 1
"""


def q_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template centrality over the near-dup candidate graph: two
    integer-exact PageRank iterations on the LSH pair graph of the
    near-dup corpus — high-rank nodes are the boilerplate templates the
    crawl duplicated most (the hubs a keep-best election drops first).
    Same pair generation as dedup_components; iterations are three
    hash shuffles each over checkpointed corpus-cardinality tables."""
    from .operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from .operators.graph import pagerank

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    return pagerank(corpus, pairs, iters=2)


def _o_pr_iter(prev_s: str, idx: int, damping_ppm: int) -> str:
    """One unrolled PageRank update in oracle SQL (ppm integers)."""
    base = 1_000_000 - damping_ppm
    return f"""
in{idx} AS (SELECT e.dst, CAST(sum(s.s // e.deg) AS BIGINT) AS inflow
        FROM e JOIN {prev_s} s ON s.node = e.src GROUP BY 1),
s{idx} AS (SELECT n.node,
         CAST({base} AS BIGINT)
         + CAST(CAST(coalesce(i.inflow, 0) AS HUGEINT) * {damping_ppm}
                // 1000000 AS BIGINT) AS s
       FROM s0 n LEFT JOIN in{idx} i ON i.dst = n.node)"""


_O_DUP_PAGERANK = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
          WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1),
e AS (SELECT edges.src, edges.dst, deg.deg
      FROM edges JOIN deg USING (src)),
s0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS s FROM corpus),
{_o_pr_iter("s0", 1, 850_000)},
{_o_pr_iter("s1", 2, 850_000)}
SELECT n.node AS doc_id,
  CAST(coalesce(deg.deg, 0) AS BIGINT) AS n_neighbors,
  s2.s AS rank_ppm
FROM s0 n LEFT JOIN deg ON deg.src = n.node
JOIN s2 ON s2.node = n.node
"""


def q_template_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-template mining: LSH pairs → connected components →
    the 8-word segments shared by ≥60% of each cluster's members — the
    literal template text the near-dup clusters keep re-emitting (the
    extraction complement of dup_pagerank's hub ranking)."""
    from .operators.dedup import connected_components, template_segments

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs)
    comps = (
        corpus.select("doc_id")
        .join(comp, corpus["doc_id"] == comp["node"], "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("component")
        )
    )
    return template_segments(corpus, comps, n=8, tau_ppm=600_000)


_O_TEMPLATE_MINE = f"""
WITH RECURSIVE corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b AS src, id_a AS dst FROM prs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
cm AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
comps AS (SELECT c.doc_id,
            coalesce(m.component, c.doc_id) AS component
          FROM corpus c LEFT JOIN cm m ON m.node = c.doc_id),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comps GROUP BY 1 HAVING count(*) >= 2),
sg AS (SELECT doc_id, string_split(text, ' ') AS wd FROM corpus
       WHERE len(string_split(text, ' ')) > 0),
occ AS (SELECT DISTINCT cp.component, sg.doc_id,
          array_to_string(
            list_slice(wd, CAST(i * 8 + 1 AS BIGINT),
                       CAST(i * 8 + 8 AS BIGINT)), ' ') AS segment
        FROM sg
        JOIN comps cp ON cp.doc_id = sg.doc_id,
        UNNEST(range(0, CAST(ceil(len(wd) / 8.0) AS BIGINT))) AS u(i)),
support AS (SELECT component, segment,
              CAST(count(*) AS BIGINT) AS n_docs
            FROM occ GROUP BY 1, 2)
SELECT s.component, s.segment, s.n_docs, z.cluster_size,
  CAST(CAST(s.n_docs AS HUGEINT) * 1000000 // z.cluster_size AS BIGINT)
    AS support_ppm
FROM support s JOIN sizes z USING (component)
WHERE CAST(s.n_docs AS HUGEINT) * 1000000
      >= CAST(z.cluster_size AS HUGEINT) * 600000
"""


def q_extract_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractor-version regression audit over a mixed-format corpus:
    the dispatcher (candidate release) vs a passthrough v0 extractor
    (no boilerplate strip), per dispatched format — which formats
    drifted, by how many characters, whether spans moved, plus units
    each side dropped or invented. The north-rule per-turn
    text-equality invariant as a distributed query instead of a
    fixture diff."""
    from .operators.extraction import extraction_diff

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    payload = (
        F.when(d % 4 == 0, F.col("text"))
        .when(
            d % 4 == 1,
            F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_SUF)),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit(_LAY_HDR),
                F.col("text"),
                F.lit(_LAY_MID),
                F.lit(_LAY_P2),
                F.lit(_LAY_SUF),
            ),
        )
        .otherwise(F.lit(""))
    )
    grp = (
        F.when(d % 4 == 0, F.lit("plain"))
        .when(d % 4 == 1, F.lit("html"))
        .when(d % 4 == 2, F.lit("layout"))
        .otherwise(F.lit("empty"))
    )
    mixed = docs.select("doc_id", grp.alias("fmt"), payload.alias("text"))
    old = mixed.select(
        "doc_id",
        "fmt",
        F.col("text").alias("extracted_text"),
        F.lit(1).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("s0_start"),
        F.length("text").cast("long").alias("s0_end"),
    )
    ex = extract_turns(mixed.filter(d % 50 != 49))
    new = ex.select(
        "doc_id",
        "extracted_text",
        F.size("spans").cast("long").alias("n_spans"),
        # get(), not [0]: the empty format has zero spans and ANSI mode
        # makes [0] an error rather than NULL
        F.get("spans", 0)["start"].cast("long").alias("s0_start"),
        F.get("spans", 0)["end"].cast("long").alias("s0_end"),
    ).unionAll(
        docs.filter(d % 100 == 7).select(
            (d + 500_000).alias("doc_id"),
            F.lit("ghost unit").alias("extracted_text"),
            F.lit(1).cast("long").alias("n_spans"),
            F.lit(0).cast("long").alias("s0_start"),
            F.lit(10).cast("long").alias("s0_end"),
        )
    )
    return extraction_diff(old, new, group_col="fmt")


_O_EXTRACT_DIFF = f"""
WITH d AS (SELECT doc_id, text, CAST(doc_id % 4 AS INT) AS m,
             (doc_id % 50 = 49) AS dropped
           FROM documents),
base AS (SELECT doc_id, m, dropped,
    CASE m WHEN 0 THEN 'plain' WHEN 1 THEN 'html'
           WHEN 2 THEN 'layout' ELSE 'empty' END AS grp,
    CASE m WHEN 0 THEN length(text)
           WHEN 1 THEN {len(_HTML_PRE)} + length(text) + {len(_HTML_SUF)}
           WHEN 2 THEN {len(_LAY_HDR) + len(_LAY_MID) + len(_LAY_P2) + len(_LAY_SUF)} + length(text)
           ELSE 0 END AS old_len,
    CASE m WHEN 0 THEN length(text)
           WHEN 1 THEN length(text)
           WHEN 2 THEN length(text) + 1 + {len(_LAY_P2)}
           ELSE 0 END AS new_len,
    (m IN (0, 3)) AS text_eq,
    (m = 0) AS span_eq
  FROM d),
grps AS (SELECT grp,
    CAST(sum(CASE WHEN NOT dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
    CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_only_old,
    CAST(0 AS BIGINT) AS n_only_new,
    CAST(sum(CASE WHEN text_eq AND NOT dropped THEN 1 ELSE 0 END)
      AS BIGINT) AS n_text_equal,
    CAST(sum(CASE WHEN span_eq AND NOT dropped THEN 1 ELSE 0 END)
      AS BIGINT) AS n_span_equal,
    CAST(sum(CASE WHEN NOT dropped THEN new_len - old_len ELSE 0 END)
      AS BIGINT) AS sum_len_delta
  FROM base GROUP BY 1),
ghost AS (SELECT '(new-only)' AS grp, CAST(0 AS BIGINT) AS n_both,
    CAST(0 AS BIGINT) AS n_only_old,
    CAST(count(*) AS BIGINT) AS n_only_new,
    CAST(0 AS BIGINT) AS n_text_equal, CAST(0 AS BIGINT) AS n_span_equal,
    CAST(0 AS BIGINT) AS sum_len_delta
  FROM documents WHERE doc_id % 100 = 7),
u AS (SELECT * FROM grps UNION ALL SELECT * FROM ghost)
SELECT grp, n_both, n_only_old, n_only_new, n_text_equal, n_span_equal,
  CAST(CAST(n_text_equal AS HUGEINT) * 1000000
       // greatest(n_both, 1) AS BIGINT) AS text_equal_ppm,
  sum_len_delta
FROM u
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: users reaching
    each step strictly after the previous step's first occurrence, with
    per-step and cumulative conversion ppm."""
    from .operators.events import event_funnel

    load_views(spark, sf_dir, "events")
    return event_funnel(spark.table("events"))


_O_EVENT_FUNNEL = """
WITH e AS (SELECT user_id, event_type, ts FROM events),
s0 AS (SELECT user_id, min(ts) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s0 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1),
c AS (SELECT 0 AS step_idx, 'view' AS step_name,
        CAST(count(*) AS BIGINT) AS n_users FROM s0
      UNION ALL SELECT 1, 'click', CAST(count(*) AS BIGINT) FROM s1
      UNION ALL SELECT 2, 'purchase', CAST(count(*) AS BIGINT) FROM s2)
SELECT step_idx, step_name, n_users,
  CAST(CAST(n_users AS HUGEINT) * 1000000
       // greatest(lag(n_users, 1, n_users) OVER (ORDER BY step_idx), 1)
    AS BIGINT) AS conv_from_prev_ppm,
  CAST(CAST(n_users AS HUGEINT) * 1000000
       // greatest(first_value(n_users) OVER (ORDER BY step_idx), 1)
    AS BIGINT) AS conv_from_first_ppm
FROM c
"""


def q_rule_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter redundancy matrix over the planted exact-dup
    corpus: pairwise flag-set intersections and Jaccard for five
    curation rules (length bands, blocklist term, repetitiousness,
    exact-dup non-keeper)."""
    from pyspark.sql import Window

    from .operators.textstats import rule_overlap

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_EXACT}) c", "documents"
    )
    wfp = Window.partitionBy(F.md5("text"))
    flagged = corpus.withColumn(
        "_dup",
        (F.count(F.lit(1)).over(wfp) > 1)
        & (F.col("doc_id") > F.min("doc_id").over(wfp)),
    )
    wd = F.split(F.col("text"), " ")
    rules = {
        "exact_dup": F.col("_dup"),
        "len_short": F.size(wd) < 25,
        "len_long": F.size(wd) > 70,
        "block_slow": F.array_contains(wd, "slow"),
        "repetitious": (F.size(wd) - F.size(F.array_distinct(wd))) > 15,
    }
    return rule_overlap(flagged, rules)


_O_RULE_OVERLAP = f"""
WITH corpus AS ({_CORPUS_EXACT}),
f AS (SELECT doc_id, string_split(text, ' ') AS wd, md5(text) AS fp
      FROM corpus),
d AS (SELECT *,
        (count(*) OVER (PARTITION BY fp) > 1
         AND doc_id > min(doc_id) OVER (PARTITION BY fp)) AS exact_dup
      FROM f),
r AS (SELECT doc_id, exact_dup,
        len(wd) < 25 AS len_short,
        len(wd) > 70 AS len_long,
        list_contains(wd, 'slow') AS block_slow,
        (len(wd) - len(list_distinct(wd))) > 15 AS repetitious
      FROM d),
fired AS (
  SELECT doc_id, 'exact_dup' AS rule FROM r WHERE exact_dup
  UNION ALL SELECT doc_id, 'len_short' FROM r WHERE len_short
  UNION ALL SELECT doc_id, 'len_long' FROM r WHERE len_long
  UNION ALL SELECT doc_id, 'block_slow' FROM r WHERE block_slow
  UNION ALL SELECT doc_id, 'repetitious' FROM r WHERE repetitious),
pc AS (SELECT a.rule AS rule_a, b.rule AS rule_b,
         CAST(count(*) AS BIGINT) AS n_both
       FROM fired a JOIN fired b USING (doc_id)
       WHERE a.rule <= b.rule GROUP BY 1, 2),
diag AS (SELECT rule_a AS r, n_both AS n FROM pc WHERE rule_a = rule_b),
uni AS (SELECT a.r AS rule_a, a.n AS n_a, b.r AS rule_b, b.n AS n_b
        FROM diag a, diag b WHERE a.r < b.r)
SELECT u.rule_a, u.rule_b, u.n_a, u.n_b,
  CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both,
  CAST(CAST(coalesce(p.n_both, 0) AS HUGEINT) * 1000000
       // (u.n_a + u.n_b - coalesce(p.n_both, 0)) AS BIGINT) AS jaccard_ppm
FROM uni u LEFT JOIN pc p ON p.rule_a = u.rule_a AND p.rule_b = u.rule_b
"""


def q_group_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k audit sample: 20 documents per source
    bucket, reproducible across runs (md5 rank, id tiebreak)."""
    from .operators.sampling import group_sample_k

    docs = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 5).alias("src"), "doc_id"
    )
    return group_sample_k(docs, "src", 20).select(
        "src", "doc_id", "sample_rank"
    )


_O_GROUP_SAMPLE_K = """
SELECT src, doc_id, sample_rank FROM (
  SELECT doc_id % 5 AS src, doc_id,
    CAST(row_number() OVER (
      PARTITION BY doc_id % 5
      ORDER BY md5('0|' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS INT) AS sample_rank
  FROM documents) s
WHERE sample_rank <= 20
"""


def assistant_loop_stats(t: DataFrame, loop_at: int = 3) -> DataFrame:
    """Agent-loop detection fold over a transcripts frame: an agent
    stuck in a loop re-emits the same assistant reply — report the
    assistant-turn count, the number of same-text runs, the longest run
    of consecutive IDENTICAL assistant texts, and a has_loop verdict
    (run ≥ ``loop_at``). User/tool turns between repeats don't break a
    run (the windowed sequence is the assistant's replies alone).
    Gaps-and-islands over the conversation partitioning: one window +
    one groupBy chain, all under hash(conv_id) — no corpus-global
    state, no skew beyond a single conversation's own length."""
    from pyspark.sql import Window as W

    a = t.filter(F.col("role") == "assistant")
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    islands = a.select(
        "conv_id",
        "turn_idx",
        "text",
        F.sum(
            F.when(
                F.lag("text").over(w).isNull()
                | (F.lag("text").over(w) != F.col("text")),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("island"),
    )
    runs = islands.groupBy("conv_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    return runs.groupBy("conv_id").agg(
        F.sum("run_len").cast("long").alias("n_assistant"),
        F.count(F.lit(1)).cast("long").alias("n_reply_runs"),
        F.max("run_len").cast("long").alias("max_consec_same"),
        (F.max("run_len") >= loop_at).alias("has_loop"),
    )


def prefix_fork_families(t: DataFrame, max_depth: int = 6) -> DataFrame:
    """Shared-prefix (retry/branch) detection over a transcripts frame.

    Agent harnesses re-run conversations: a failed rollout is retried
    from turn k, sampling forks branch after a shared context, and an
    SFT set built naively from such logs over-weights the shared prefix
    verbatim. This operator finds **prefix families** — groups of ≥2
    conversations whose first ``d`` turns are textually identical — via
    a rolling prefix fingerprint: ``md5(concat_ws(chr(1), texts[1..d]))``
    per (conv, d), one ordered window under the conversation
    partitioning (extraction's own shuffle key — composing after it
    adds no Exchange).

    The depth cap bounds everything: each conversation contributes at
    most ``max_depth`` fingerprint rows regardless of its length, so the
    family groupBy shuffles ≤ max_depth rows/conv (map-side combinable)
    and the window state never exceeds max_depth texts — the
    long-conversation skew guard is structural, not remedial. At 10¹²
    turns this is one conv-keyed Exchange + two bounded groupBys.

    Returns one row per family: ``(depth, prefix_key, n_convs,
    exemplar_conv, n_maximal_convs)`` where ``n_maximal_convs`` counts
    the members whose DEEPEST shared depth is this family's depth —
    i.e. how many branches actually diverge right after it (the fork
    point), vs merely passing through toward a deeper shared prefix.

    Reference analog: the duplicate-skip anti-join (FR-019) detects
    whole-document re-submissions; this is the turn-granular
    generalization for partially re-run conversations.
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pref = t.filter(F.col("turn_idx") <= max_depth).select(
        "conv_id",
        "turn_idx",
        F.md5(
            F.concat_ws("\x01", F.collect_list("text").over(w))
        ).alias("prefix_key"),
    )
    fams = (
        pref.groupBy(
            F.col("turn_idx").cast("int").alias("depth"), "prefix_key"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.min("conv_id").alias("exemplar_conv"),
        )
        .filter(F.col("n_convs") >= 2)
    )
    shared = pref.join(
        fams.select(
            F.col("depth").alias("turn_idx"), "prefix_key"
        ),
        ["turn_idx", "prefix_key"],
    )
    conv_max = shared.groupBy("conv_id").agg(
        F.max("turn_idx").alias("_mx")
    )
    maximal = (
        shared.join(conv_max, "conv_id")
        .filter(F.col("turn_idx") == F.col("_mx"))
        .groupBy(
            F.col("turn_idx").cast("int").alias("depth"), "prefix_key"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_n_max"))
    )
    return fams.join(maximal, ["depth", "prefix_key"], "left").select(
        "depth",
        "prefix_key",
        "n_convs",
        "exemplar_conv",
        F.coalesce("_n_max", F.lit(0).cast("long")).alias(
            "n_maximal_convs"
        ),
    )


def q_prefix_forks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fork families over a corpus with planted retry branches:
    conversation c1 gets a retry diverging after turn 3 and an
    alternate diverging after turn 1; c7 a retry diverging after
    turn 5 (see :func:`prefix_fork_families`)."""
    t = spark_transcripts(spark, sf_dir)
    base = t.filter(F.col("turn_idx") <= 6).select(
        "conv_id", "turn_idx", "text"
    )

    def clone(src: str, keep: int, tag: str, pre: str) -> DataFrame:
        return base.filter(F.col("conv_id") == src).select(
            F.concat(F.lit(tag + "-"), F.col("conv_id")).alias("conv_id"),
            "turn_idx",
            F.when(F.col("turn_idx") <= keep, F.col("text"))
            .otherwise(F.concat(F.lit(pre), F.col("text")))
            .alias("text"),
        )

    corpus = (
        base.unionAll(clone("c1", 3, "r1", "retry: "))
        .unionAll(clone("c1", 1, "r2", "alt: "))
        .unionAll(clone("c7", 5, "r1", "retry: "))
    )
    return prefix_fork_families(corpus, max_depth=6)


_O_PREFIX_FORKS = oracle_cte(
    """
, base AS (SELECT conv_id, turn_idx, text FROM t WHERE turn_idx <= 6),
corpus AS (
  SELECT conv_id, turn_idx, text FROM base
  UNION ALL
  SELECT 'r1-' || conv_id, turn_idx,
         CASE WHEN turn_idx <= 3 THEN text ELSE 'retry: ' || text END
  FROM base WHERE conv_id = 'c1'
  UNION ALL
  SELECT 'r2-' || conv_id, turn_idx,
         CASE WHEN turn_idx <= 1 THEN text ELSE 'alt: ' || text END
  FROM base WHERE conv_id = 'c1'
  UNION ALL
  SELECT 'r1-' || conv_id, turn_idx,
         CASE WHEN turn_idx <= 5 THEN text ELSE 'retry: ' || text END
  FROM base WHERE conv_id = 'c7'
),
pref AS (SELECT conv_id, turn_idx,
    md5(string_agg(text, chr(1)) OVER (PARTITION BY conv_id
        ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)) AS prefix_key
  FROM corpus),
fams AS (SELECT CAST(turn_idx AS INT) AS depth, prefix_key,
    CAST(count(*) AS BIGINT) AS n_convs, min(conv_id) AS exemplar_conv
  FROM pref GROUP BY 1, 2 HAVING count(*) >= 2),
shared AS (SELECT p.conv_id, p.turn_idx, p.prefix_key FROM pref p
  JOIN fams f ON f.depth = p.turn_idx AND f.prefix_key = p.prefix_key),
cm AS (SELECT conv_id, max(turn_idx) AS mx FROM shared GROUP BY 1),
mx AS (SELECT CAST(s.turn_idx AS INT) AS depth, s.prefix_key,
    CAST(count(*) AS BIGINT) AS n_maximal_convs
  FROM shared s JOIN cm ON cm.conv_id = s.conv_id AND s.turn_idx = cm.mx
  GROUP BY 1, 2)
SELECT f.depth, f.prefix_key, f.n_convs, f.exemplar_conv,
  coalesce(mx.n_maximal_convs, 0) AS n_maximal_convs
FROM fams f LEFT JOIN mx
  ON mx.depth = f.depth AND mx.prefix_key = f.prefix_key
"""
)


def q_loop_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent-loop detection per conversation (see
    :func:`assistant_loop_stats`)."""
    return assistant_loop_stats(spark_transcripts(spark, sf_dir))


_O_LOOP_DETECT = oracle_cte(
    """
, a AS (SELECT conv_id, turn_idx, text FROM t WHERE role = 'assistant'),
l AS (SELECT conv_id, turn_idx, text,
        lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pt
      FROM a),
i AS (SELECT conv_id, turn_idx, text,
        sum(CASE WHEN pt IS NULL OR pt <> text THEN 1 ELSE 0 END)
          OVER (PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) AS island
      FROM l),
runs AS (SELECT conv_id, island, CAST(count(*) AS BIGINT) AS run_len
         FROM i GROUP BY 1, 2)
SELECT conv_id,
  CAST(sum(run_len) AS BIGINT) AS n_assistant,
  CAST(count(*) AS BIGINT) AS n_reply_runs,
  CAST(max(run_len) AS BIGINT) AS max_consec_same,
  (max(run_len) >= 3) AS has_loop
FROM runs GROUP BY 1
"""
)


def q_context_taint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-taint propagation: a turn flagged by a content rule
    (here: contains the token 'slow') taints every turn within ±2
    positions of it in the same conversation — the pattern a safety
    scrub uses so a removed turn's conversational context goes with it.
    One bounded frame window under the conversation partitioning."""
    from pyspark.sql import Window as W

    t = spark_transcripts(spark, sf_dir)
    flagged = F.array_contains(F.split(F.col("text"), " "), "slow")
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-2, 2)
    )
    return t.select(
        "conv_id",
        "turn_idx",
        flagged.alias("flagged"),
        (F.max(flagged.cast("int")).over(w) == 1).alias("tainted"),
    )


_O_CONTEXT_TAINT = oracle_cte(
    """
, f AS (SELECT conv_id, turn_idx,
          list_contains(string_split(text, ' '), 'slow') AS flagged
        FROM t)
SELECT conv_id, turn_idx, flagged,
  (max(CASE WHEN flagged THEN 1 ELSE 0 END)
     OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) = 1) AS tainted
FROM f
"""
)


def q_conv_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-granularity near-dup candidates: each conversation's
    turns are concatenated under stable (conv_id, turn_idx) ordering
    into one document, a ~19% deterministic slice gets a planted
    trailing-token twin, and MinHash/LSH banding pairs the near-dups —
    dedup at the grain the transcript corpus is actually ingested and
    dropped at (a crawl re-serves whole conversations, not turns). The
    concat is one groupBy(conv_id) with per-conv bounded state; the LSH
    ladder is the shared bucketed pipeline (never all-pairs)."""
    t = spark_transcripts(spark, sf_dir)
    cd = t.groupBy("conv_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda x: F.coalesce(x["text"], F.lit("")),
            ),
        ).alias("text")
    )
    sel = F.substring(F.md5("conv_id"), 1, 1).isin("0", "1", "2")
    twin = cd.filter(sel).select(
        F.concat(F.col("conv_id"), F.lit("~b")).alias("conv_id"),
        F.concat("text", F.lit(" extra trailing token")).alias("text"),
    )
    corpus = cd.unionByName(twin)
    return lsh_candidate_pairs(
        minhash_signatures(
            word_shingles(corpus, id_col="conv_id"), id_col="conv_id"
        ),
        id_col="conv_id",
    )


_O_CONV_NEARDUP = oracle_cte(
    """
, cd AS (SELECT conv_id,
           string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS text
         FROM t GROUP BY 1),
corpus AS (SELECT conv_id, text FROM cd
           UNION ALL
           SELECT conv_id || '~b', text || ' extra trailing token'
           FROM cd WHERE substring(md5(conv_id), 1, 1) IN ('0', '1', '2')),
w AS (SELECT conv_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT conv_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT conv_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY conv_id, k),
bands AS (SELECT conv_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY conv_id, 2)
SELECT DISTINCT a.conv_id AS id_a, b.conv_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
WHERE a.conv_id < b.conv_id
"""
)


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof train/val/test assignment: the split key is the
    near-dup COMPONENT, not the document, so near-duplicates can never
    straddle a split boundary (``split_leakage`` audits exactly the
    failure this op makes impossible — assigning by doc hash puts a
    near-dup pair in train and test ~18% of the time at 80/10/10).
    Composition: LSH pairs → connected components → deterministic
    hex-threshold hash split ON the component id, propagated to every
    member. The split itself stays map-only over the (doc, component)
    table."""
    from .operators.dedup import connected_components
    from .operators.sampling import hash_split

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs)
    comps = (
        corpus.select("doc_id")
        .join(comp, corpus["doc_id"] == comp["node"], "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("component")
        )
    )
    return hash_split(
        comps, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="component"
    ).select("doc_id", "component", "split")


def _o_cluster_split() -> str:
    from .operators.sampling import _hex_threshold

    t80, t90 = _hex_threshold(0.8), _hex_threshold(0.9)
    return f"""
WITH RECURSIVE corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b AS src, id_a AS dst FROM prs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
cm AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
comps AS (SELECT c.doc_id,
            coalesce(m.component, c.doc_id) AS component
          FROM corpus c LEFT JOIN cm m ON m.node = c.doc_id)
SELECT doc_id, component,
  CASE WHEN substring(md5(CAST(component AS VARCHAR) || ':0'), 1, 8)
            < '{t80}' THEN 'train'
       WHEN substring(md5(CAST(component AS VARCHAR) || ':0'), 1, 8)
            < '{t90}' THEN 'val'
       ELSE 'test' END AS split
FROM comps
"""


#: corpus with planted quoting: every 10th doc gets a +200000 twin that
#: concatenates it with its successor — the contained-document shape an
#: asymmetric containment detector exists for (dialect-neutral SQL)
_CORPUS_QUOTE = """
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT a.doc_id + 200000 AS doc_id, a.text || ' ' || b.text AS text
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id < 150 AND a.doc_id % 10 = 0
"""


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (MOSS per-file percentage) over a corpus
    with planted quote documents: the short side of a verbatim quote
    scores near 10⁶ ppm where symmetric overlap would miss it."""
    from .operators.textstats import (
        winnow_containment_pairs,
        winnow_fingerprints,
    )

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_QUOTE}) c", "documents"
    )
    wf = winnow_fingerprints(corpus, k=8, w=4)
    return winnow_containment_pairs(wf, min_df=2, max_df=10, min_shared=5)


_O_CONTAINMENT = f"""
WITH corpus AS ({_CORPUS_QUOTE}),
g AS (SELECT doc_id,
    list_transform(range(1, length(text) - 8 + 2),
                   i -> md5(substr(text, i, 8))) AS gh
  FROM corpus WHERE length(text) >= 11),
w AS (SELECT doc_id,
    list_distinct(list_transform(range(0, len(gh) - 4 + 1),
                  j -> list_min(list_slice(gh, j + 1, j + 4)))) AS fps
  FROM g),
wf AS (SELECT doc_id, UNNEST(fps) AS fp FROM w),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
           FROM wf GROUP BY 1),
rare AS (SELECT fp FROM wf GROUP BY fp
         HAVING count(*) BETWEEN 2 AND 10),
wfr AS (SELECT wf.doc_id, wf.fp FROM wf JOIN rare USING (fp)),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS shared_fps
          FROM wfr a JOIN wfr b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 5)
SELECT p.id_a, p.id_b, p.shared_fps, ta.n_fp AS n_fp_a, tb.n_fp AS n_fp_b,
  CAST(CAST(p.shared_fps AS HUGEINT) * 1000000 // ta.n_fp AS BIGINT)
    AS contain_a_ppm,
  CAST(CAST(p.shared_fps AS HUGEINT) * 1000000 // tb.n_fp AS BIGINT)
    AS contain_b_ppm
FROM pairs p
JOIN totals ta ON ta.doc_id = p.id_a
JOIN totals tb ON tb.doc_id = p.id_b
"""


def q_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal per document (Arrow-batched
    pandas UDF). DuckDB has no zlib, so the oracle embeds a
    construction-literal ``(doc_id, n_compressed)`` table computed at
    ``oracle_sql()`` build time by Python zlib over the *input* parquet
    (an independent execution path — pyarrow read + driver-side zlib vs
    Spark Arrow batches; see :func:`_o_compress_ratio`), making this
    hash-green instead of rows-only (VERDICT r4 task #3)."""
    from .operators.textstats import compression_ratio

    return compression_ratio(_docs(spark, sf_dir))


def _o_compress_ratio(sf_dir: str | None = None) -> str:
    """Build the compress_ratio oracle for ``sf_dir`` (default: the
    driver's gate dir, overridable via ``SPARK_GRAFT_ORACLE_SF_DIR``).

    The zlib lengths are computed here, driver-side, from the raw input
    texts — never from Spark output — so the oracle stays a second,
    independent implementation: DuckDB derives ``n_bytes``/``ratio_ppm``/
    ``keep`` in SQL from the documents view joined to the literal table.
    The synthetic corpus is deterministic per sf dir, so the table is a
    build-time constant (zlib level 6 is fully deterministic)."""
    import os as _os
    import zlib as _zlib

    import duckdb as _duckdb

    sf_dir = sf_dir or _os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = _duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
        [f"{sf_dir}/documents.parquet"],
    ).fetchall()
    con.close()
    vals = ",".join(
        f"({i},{len(_zlib.compress((t or '').encode('utf-8'), 6))})"
        for i, t in rows
    )
    return f"""
WITH zl(doc_id, zlen) AS (VALUES {vals}),
d AS (SELECT doc_id,
        CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
          AS n_bytes
      FROM documents),
r AS (SELECT d.doc_id, d.n_bytes, CAST(zl.zlen AS BIGINT) AS n_compressed,
        CASE WHEN d.n_bytes = 0 THEN CAST(1000000 AS BIGINT)
             ELSE CAST(CAST(zl.zlen AS HUGEINT) * 1000000 // d.n_bytes
                       AS BIGINT) END AS ratio_ppm
      FROM d JOIN zl USING (doc_id))
SELECT doc_id, n_bytes, n_compressed, ratio_ppm,
  (ratio_ppm >= 250000 AND ratio_ppm <= 900000) OR n_bytes = 0 AS keep
FROM r
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis on the conversation key: the 10 longest
    conversations with their row share — the measurement behind the
    north rule's "explicit skew handling for long conversations" (salt
    only what this table proves skewed)."""
    from .operators.sampling import skew_report

    return skew_report(spark_transcripts(spark, sf_dir), "conv_id", topn=10)


_O_SKEW_REPORT = oracle_cte(
    """
, c AS (SELECT CAST(conv_id AS VARCHAR) AS key,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM t GROUP BY 1),
tot AS (SELECT sum(n_rows) AS _total FROM c),
top AS (SELECT key, n_rows FROM c ORDER BY n_rows DESC, key ASC LIMIT 10)
SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC) AS INT)
         AS rank,
  key, n_rows,
  CAST(CAST(n_rows AS HUGEINT) * 1000000 // _total AS BIGINT)
    AS share_ppm,
  CAST(CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, key ASC
              ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000 // _total
    AS BIGINT) AS cum_share_ppm
FROM top, tot
"""
)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 per query over the documents corpus under the
    integer-exact half-log2-bit idf / milli-unit tf saturation (see
    :mod:`operators.retrieval`). Query set: 9 deterministic 3-term
    queries drawn from token positions 2-4 of every 37th document —
    bounded, broadcast-class."""
    from .operators.retrieval import bm25_topk

    docs = _docs(spark, sf_dir)
    raw = docs.filter(
        (F.col("doc_id") % 37 == 3) & (F.col("doc_id") < 300)
    ).select(
        F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
            "query_id"
        ),
        F.split(F.col("text"), " ").alias("_raw"),
    )
    queries = (
        raw.select(
            "query_id",
            F.explode(
                F.array(
                    F.try_element_at("_raw", F.lit(2)),
                    F.try_element_at("_raw", F.lit(3)),
                    F.try_element_at("_raw", F.lit(4)),
                )
            ).alias("term"),
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
        .distinct()
    )
    return bm25_topk(docs, queries, k=5)


_O_BM25_TOPK = """
WITH qraw AS (SELECT 'q' || CAST(doc_id AS VARCHAR) AS query_id,
                string_split(text, ' ') AS raw
              FROM documents WHERE doc_id % 37 = 3 AND doc_id < 300),
qt AS (SELECT DISTINCT query_id, u.term
       FROM qraw, UNNEST([list_extract(raw, 2), list_extract(raw, 3),
                          list_extract(raw, 4)]) AS u(term)
       WHERE u.term IS NOT NULL AND u.term <> ''),
tk AS (SELECT doc_id, u.term AS term
       FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
       WHERE u.term <> ''),
dlen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk GROUP BY 1),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) * 1000 // count(*) AS BIGINT) AS avgdl_m
       FROM dlen),
tf AS (SELECT tk.term, tk.doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM tk JOIN (SELECT DISTINCT term FROM qt) v USING (term)
       GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idf AS (SELECT term,
          CAST((length(to_base(CAST(r * r // 1024 AS BIGINT), 2)) - 11)
               AS BIGINT) * 500000 AS idf_ppm
        FROM (SELECT term,
                least((2 * n_docs + 2) * 1024 // (2 * df + 1),
                      1073741824) AS r
              FROM dfq, st)),
sc AS (SELECT qt.query_id, tf.doc_id,
         CAST(CAST(idf.idf_ppm AS HUGEINT) *
           (CAST(tf.tf * 2200 AS HUGEINT) * 1000000 //
            (tf.tf * 1000 +
             (1200 * (250 + (750 * (dlen.dl * 1000000 // st.avgdl_m))
                            // 1000)) // 1000))
           // 1000000 AS BIGINT) AS contrib
       FROM tf
       JOIN idf USING (term)
       JOIN qt USING (term)
       JOIN dlen ON dlen.doc_id = tf.doc_id
       CROSS JOIN st),
s AS (SELECT query_id, doc_id,
        CAST(count(*) AS BIGINT) AS n_terms,
        CAST(sum(contrib) AS BIGINT) AS score_ppm
      FROM sc GROUP BY 1, 2),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY score_ppm DESC, doc_id) AS INT) AS rank FROM s)
SELECT query_id, doc_id, n_terms, score_ppm, rank FROM r WHERE rank <= 5
"""


def q_screen_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the two independent quality raters the repo
    already ships — the Gopher character-heuristic screen
    (``quality_score.keep``) and the CCNet LM banding
    (``lm_quality_bands.band <> 'tail'``) — the do-these-screens-agree
    audit a multi-rater curation funnel runs before chaining them."""
    from .operators.textstats import (
        lm_quality_bands,
        quality_score,
        screen_agreement,
    )

    docs = _docs(spark, sf_dir)
    a = quality_score(docs).select(
        "doc_id", F.col("keep").alias("keep_a")
    )
    b = lm_quality_bands(docs).select(
        "doc_id", (F.col("band") != "tail").alias("keep_b")
    )
    return screen_agreement(a.join(b, "doc_id"))


_O_SCREEN_AGREEMENT = """
WITH s AS (SELECT doc_id,
    CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS n_punct,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      AS n_digit,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
  FROM documents),
qa AS (SELECT doc_id,
    (n_tokens >= 5 AND n_tokens <= 100000
     AND n_nonspace / n_tokens >= 2.0 AND n_nonspace / n_tokens <= 12.0
     AND n_punct / n_chars <= 0.30 AND n_digit / n_chars <= 0.50)
      AS keep_a
  FROM s),
tk AS (SELECT doc_id, lang, u.term AS term
       FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
       WHERE u.term <> ''),
tf AS (SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
       FROM tk GROUP BY 1, 2, 3),
m AS (SELECT lang, term, CAST(sum(tf) AS BIGINT) AS cnt
      FROM tf GROUP BY 1, 2),
sc AS (SELECT tf.doc_id, tf.lang,
         CAST(sum(tf.tf * (1000000000 // m.cnt)) // sum(tf.tf) AS BIGINT)
           AS score_key
       FROM tf JOIN m ON tf.lang = m.lang AND tf.term = m.term
       GROUP BY 1, 2),
qb AS (SELECT doc_id,
    (ntile(3) OVER (PARTITION BY lang ORDER BY score_key, doc_id) <> 3)
      AS keep_b
  FROM sc),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END) AS BIGINT)
      AS n11,
    CAST(sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS BIGINT)
      AS n10,
    CAST(sum(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END) AS BIGINT)
      AS n01,
    CAST(sum(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END)
      AS BIGINT) AS n00
  FROM qa JOIN qb USING (doc_id)),
p AS (SELECT *,
    (n11 + n00) * 1000000 // n_docs AS po_ppm,
    CAST((CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
          + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) * 1000000
         // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_ppm
  FROM c)
SELECT n_docs, n11, n10, n01, n00, po_ppm, pe_ppm,
  CAST(CASE WHEN pe_ppm = 1000000 THEN NULL
       WHEN po_ppm >= pe_ppm THEN
         (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
       ELSE
         -((pe_ppm - po_ppm) * 1000000 // (1000000 - pe_ppm))
       END AS BIGINT) AS kappa_ppm
FROM p
"""


def q_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit over the preference-pair construction: how
    often the diversity-reward winner is also the character-length
    winner, by reward-gap band (see
    :func:`operators.examples.pair_length_bias`)."""
    from .operators.examples import pair_length_bias

    return pair_length_bias(spark_transcripts(spark, sf_dir))


_O_LENGTH_BIAS = oracle_cte(
    """
, cand AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(list_distinct(
      string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+')),
      x -> x <> '')) AS BIGINT) AS n_tok,
    CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
  FROM t WHERE role = 'assistant'
),
r AS (SELECT conv_id, n_tok, n_chars,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY n_tok DESC, n_chars DESC, turn_idx) AS rhi,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY n_tok ASC, n_chars ASC, turn_idx DESC) AS rlo,
    CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_candidates
  FROM cand),
p AS (SELECT hi.n_tok - lo.n_tok AS gap,
        hi.n_chars AS hc, lo.n_chars AS lc
  FROM (SELECT * FROM r WHERE rhi = 1) hi
  JOIN (SELECT * FROM r WHERE rlo = 1) lo USING (conv_id)
  WHERE hi.n_candidates >= 2),
b AS (SELECT CASE WHEN gap = 0 THEN '0' WHEN gap <= 2 THEN '1-2'
                  ELSE '3+' END AS gap_band, gap, hc, lc FROM p)
SELECT gap_band, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN hc > lc THEN 1 ELSE 0 END) AS BIGINT)
    AS n_chosen_longer,
  CAST(sum(CASE WHEN hc = lc THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ties,
  CAST(sum(CASE WHEN hc > lc THEN 1 ELSE 0 END) * 1000000 // count(*)
    AS BIGINT) AS chosen_longer_ppm,
  CAST(sum(hc) // count(*) AS BIGINT) AS avg_chosen_chars,
  CAST(sum(lc) // count(*) AS BIGINT) AS avg_rejected_chars
FROM b GROUP BY 1
"""
)


def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation table over the documents corpus (min pair support
    5) — see :func:`operators.textstats.pmi_collocations`."""
    from .operators.textstats import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir), min_count=5)


_O_PMI_PAIRS = """
WITH tk AS (SELECT list_filter(string_split(text, ' '), x -> x <> '')
              AS toks
            FROM documents),
tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n_tok,
          CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_pairs_tot
        FROM tk),
u AS (SELECT uu.w AS w, CAST(count(*) AS BIGINT) AS c_w
      FROM tk, UNNEST(toks) AS uu(w) GROUP BY 1),
bg AS (SELECT b.b.w1 AS w1, b.b.w2 AS w2, CAST(count(*) AS BIGINT)
           AS n_pair
       FROM (SELECT UNNEST(list_transform(range(1, len(toks)),
                i -> {'w1': toks[i], 'w2': toks[i+1]})) AS b
             FROM tk WHERE len(toks) >= 2) b
       GROUP BY 1, 2 HAVING count(*) >= 5),
s AS (SELECT bg.w1, bg.w2, bg.n_pair, u1.c_w AS n_w1, u2.c_w AS n_w2,
        least(CAST(CAST(bg.n_pair AS HUGEINT) * n_tok // u1.c_w
                   AS HUGEINT) * n_tok * 1024
              // (CAST(u2.c_w AS HUGEINT) * n_pairs_tot),
              CAST(1073741824 AS HUGEINT)) AS r
      FROM bg JOIN u u1 ON u1.w = bg.w1
              JOIN u u2 ON u2.w = bg.w2, tot)
SELECT w1, w2, n_pair, n_w1, n_w2,
  CAST(length(to_base(CAST(r * r // 1024 AS BIGINT), 2)) - 11 AS BIGINT)
    AS pmi_hb
FROM s
"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality audit of the marker-word language heuristic
    against the corpus's labeled ``lang`` column: the confusion matrix
    with per-cell recall — the audit a pipeline runs before trusting a
    cheap lang-id to route 100 TB (the labeled ``zh`` slice has no
    marker set, so the matrix exposes exactly where the heuristic is
    blind). lang_id itself is map-only (the ``keep=`` passthrough
    carries the truth label — one projection, no self-join); the matrix
    groupBy is ONE shuffle down to ≤|langs|² rows; marginals come from
    windows over that bounded cell table, never a second corpus pass."""
    from pyspark.sql import Window as W

    from .operators.textstats import lang_id

    pred = lang_id(_docs(spark, sf_dir), keep=("lang",))
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_true = W.partitionBy("lang")
    w_pred = W.partitionBy("pred_lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.sum("n_docs").over(w_true).cast("long").alias("n_true"),
        F.sum("n_docs").over(w_pred).cast("long").alias("n_pred"),
    ).select(
        "*",
        F.expr("n_docs * 1000000 div n_true").alias("recall_cell_ppm"),
        F.expr("n_docs * 1000000 div n_pred").alias(
            "precision_cell_ppm"
        ),
    )


_O_LANGID_CONFUSION = f"""
WITH pred AS ({_O_LANG_ID.strip()}),
truth AS (SELECT doc_id, lang FROM documents),
cells AS (SELECT t.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
          FROM truth t JOIN pred p USING (doc_id) GROUP BY 1, 2),
m AS (SELECT lang, pred_lang, n_docs,
        CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS n_true,
        CAST(sum(n_docs) OVER (PARTITION BY pred_lang) AS BIGINT)
          AS n_pred
      FROM cells)
SELECT lang, pred_lang, n_docs, n_true, n_pred,
  n_docs * 1000000 // n_true AS recall_cell_ppm,
  n_docs * 1000000 // n_pred AS precision_cell_ppm
FROM m
"""


def q_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition drift between two snapshots: per-source share
    deltas and the total-variation distance, in exact ppm. Snapshots
    here are the deterministic hash halves of the documents table (the
    last-batch-vs-this-batch shape). Thin wrapper over
    :func:`~poc_document_ocr_spark.operators.sampling.mix_drift_report`
    (see its docstring for the one-shuffle scale shape)."""
    from .operators.sampling import mix_drift_report

    docs = _docs(spark, sf_dir)
    # snapshot splitter shared verbatim with the oracle: first md5 hex
    # nibble of the stringified id, < '8' -> snapshot A
    in_a = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    )
    return mix_drift_report(docs, in_a)


_O_MIX_DRIFT = """
WITH h AS (SELECT source,
    -- splitter shared verbatim with the Spark side: first md5 hex
    -- nibble of the stringified id, < '8' -> snapshot A
    (substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8') AS in_a
  FROM documents),
cells AS (SELECT source,
    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM h GROUP BY 1),
s AS (SELECT source, n_a, n_b,
    CAST(CAST(n_a AS HUGEINT) * 1000000 // sum(n_a) OVER () AS BIGINT)
      AS p_a_ppm,
    CAST(CAST(n_b AS HUGEINT) * 1000000 // sum(n_b) OVER () AS BIGINT)
      AS p_b_ppm
  FROM cells)
SELECT source, n_a, n_b, p_a_ppm, p_b_ppm,
  p_b_ppm - p_a_ppm AS delta_ppm,
  CAST(sum(abs(p_b_ppm - p_a_ppm)) OVER () // 2 AS BIGINT) AS tvd_ppm
FROM s
"""


def q_boiler_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate load: share of each source's winnowing-
    fingerprint mass duplicated anywhere in the corpus — ranks crawl
    sources by template/navigation chrome before dedup budget is spent.
    Composition: winnow_fingerprints (map-side HOFs) →
    source_boilerplate_share (fp-df groupBy + two equi joins + bounded
    source groupBy; corpus-cardinality sides never broadcast)."""
    from .operators.textstats import (
        source_boilerplate_share,
        winnow_fingerprints,
    )

    docs = _docs(spark, sf_dir)
    wf = winnow_fingerprints(docs, k=8, w=4)
    return source_boilerplate_share(wf, docs.select("doc_id", "source"))


_O_BOILER_SHARE = """
WITH g AS (SELECT doc_id,
    list_transform(range(1, length(text) - 8 + 2),
                   i -> md5(substr(text, i, 8))) AS gh
  FROM documents WHERE length(text) >= 11),
w AS (SELECT doc_id,
    list_distinct(list_transform(range(0, len(gh) - 4 + 1),
                  j -> list_min(list_slice(gh, j + 1, j + 4)))) AS fps
  FROM g),
fps AS (SELECT doc_id, UNNEST(fps) AS fp FROM w),
dftab AS (SELECT fp, CAST(count(*) AS BIGINT) AS df FROM fps GROUP BY 1),
j AS (SELECT d.source, f.fp, t.df
      FROM fps f JOIN dftab t USING (fp)
      JOIN documents d USING (doc_id))
SELECT source,
  CAST(count(*) AS BIGINT) AS n_fp,
  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_fp,
  CAST(count(DISTINCT CASE WHEN df >= 2 THEN fp END) AS BIGINT)
    AS n_boiler_fp,
  CAST(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS HUGEINT)
       * 1000000 // count(*) AS BIGINT) AS dup_share_ppm
FROM j GROUP BY 1
"""

#: near-dup corpus with TRIPLE copies for doc_id % 5 = 0 (the two twins
#: share identical text, so their LSH edge is certain) — gives the
#: triangle query real cliques AND chain-shaped false-positive paths
_CORPUS_TRI = """
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra trailing token' AS text
  FROM documents WHERE doc_id < 200 AND doc_id % 5 < 2
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || ' extra trailing token' AS text
  FROM documents WHERE doc_id < 200 AND doc_id % 5 = 0
"""


def q_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph cohesion audit: exact per-node triangle counts and
    local clustering coefficient over the LSH candidate graph — true
    duplicate groups are cliques (clust_ppm ≈ 1e6), LSH false-positive
    chains are triangle-free (clust_ppm ≈ 0), so a large low-clustering
    component flags transitive over-merge before keep-best collapses
    distinct docs. Degree-ordered edge-iterator (Suri & Vassilvitskii
    WWW'11) — wedge fan-out capped at O(√m) per node."""
    from .operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from .operators.graph import triangle_counts

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_TRI}) corpus", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    return triangle_counts(pairs)


_O_DUP_TRIANGLES = f"""
WITH corpus AS ({_CORPUS_TRI}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
p AS (SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
      WHERE a.doc_id < b.doc_id),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT lo AS node FROM p UNION ALL SELECT hi AS node FROM p)
        GROUP BY 1),
-- independent formulation: enumerate id-ordered triples a<b<c directly
-- (the Spark side uses the degree-ordered direction; same triangles)
tr AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
       FROM p e1 JOIN p e2 ON e2.lo = e1.hi
       JOIN p e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
         SELECT a AS node FROM tr UNION ALL SELECT b FROM tr
         UNION ALL SELECT c FROM tr) GROUP BY 1)
SELECT deg.node, deg.deg, coalesce(pn.n_tri, 0) AS n_tri,
  CASE WHEN deg.deg >= 2 THEN
    CAST(CAST(coalesce(pn.n_tri, 0) AS HUGEINT) * 2000000
         // (deg.deg * (deg.deg - 1)) AS BIGINT)
  ELSE 0 END AS clust_ppm
FROM deg LEFT JOIN pn USING (node)
"""


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequency cap (the C4/RefinedWeb no-dominant-domain
    rule): keep ~60 docs per source by deriving each source's keep
    fraction from its observed count and hash-thresholding — the
    skew-correct twin of exact top-k (no per-source sort, no straggler
    on a megadomain). Bounded counts groupBy + broadcast threshold
    table + one map pass."""
    from .operators.sampling import source_frequency_cap

    return source_frequency_cap(_docs(spark, sf_dir), cap=60)


_O_SOURCE_CAP = """
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY 1),
ppm AS (SELECT source, n,
          CAST(CAST(least(CAST(60 AS BIGINT), n) AS HUGEINT) * 1000000
               // n AS BIGINT) AS keep_ppm
        FROM c),
thr AS (SELECT source, keep_ppm,
          CASE WHEN keep_ppm * 4294967296 // 1000000 >= 4294967296
               THEN 'g'
               ELSE printf('%08x', keep_ppm * 4294967296 // 1000000)
          END AS t
        FROM ppm),
k AS (SELECT d.source, thr.keep_ppm,
        CASE WHEN substr(md5(CAST(d.doc_id AS STRING) || ':0'), 1, 8)
             < thr.t THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN thr USING (source))
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs_in,
  CAST(sum(kept) AS BIGINT) AS n_docs_kept,
  keep_ppm
FROM k GROUP BY source, keep_ppm
"""

#: simulated next-crawl snapshot: doc_id % 7 = 1 rows vanish, doc_id %
#: 5 = 3 rows change content, doc_id % 9 = 2 rows gain a fresh-id copy
_SNAPSHOT_B = """
  SELECT doc_id, source, text FROM documents
  WHERE doc_id % 7 <> 1 AND doc_id % 5 <> 3
  UNION ALL
  SELECT doc_id, source, text || ' changed' AS text FROM documents
  WHERE doc_id % 7 <> 1 AND doc_id % 5 = 3
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, source, text FROM documents
  WHERE doc_id % 9 = 2
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-to-crawl content diff: added/removed/changed/same per
    source between the documents table and a simulated next snapshot,
    with integer-ppm churn — the release audit before a snapshot swap.
    One full-outer sort-merge join on doc_id over md5 projections."""
    from .operators.dedup import snapshot_diff

    a = _docs(spark, sf_dir)
    b = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_SNAPSHOT_B}) b", "documents"
    )
    return snapshot_diff(a, b)


_O_SNAPSHOT_DIFF = f"""
WITH b AS ({_SNAPSHOT_B}),
ha AS (SELECT doc_id, source, md5(text) AS h FROM documents),
hb AS (SELECT doc_id, source, md5(text) AS h FROM b),
j AS (SELECT coalesce(ha.source, hb.source) AS source,
        CASE WHEN ha.h IS NULL THEN 'added'
             WHEN hb.h IS NULL THEN 'removed'
             WHEN ha.h <> hb.h THEN 'changed'
             ELSE 'same' END AS st
      FROM ha FULL OUTER JOIN hb USING (doc_id))
SELECT source,
  CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_added,
  CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_changed,
  CAST(sum(CASE WHEN st = 'same' THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
  CAST(CAST(sum(CASE WHEN st <> 'same' THEN 1 ELSE 0 END) AS HUGEINT)
       * 1000000 // count(*) AS BIGINT) AS churn_ppm
FROM j GROUP BY 1
"""


def q_number_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupported-number hallucination screen: per conversation, the
    share of assistant-emitted numeric tokens that appeared nowhere
    earlier in the conversation. One (conv, num) groupBy, one co-keyed
    equi join, one conv rollup — no corpus window, nothing broadcast."""
    from .operators.textstats import number_support

    return number_support(spark_transcripts(spark, sf_dir))


_O_NUMBER_SUPPORT = oracle_cte("""
, nums AS (SELECT conv_id, turn_idx, role,
    UNNEST(list_distinct(regexp_extract_all(text, '[0-9]+'))) AS num
  FROM t),
fs AS (SELECT conv_id, num, min(turn_idx) AS first_turn
       FROM nums GROUP BY 1, 2),
a AS (SELECT n.conv_id, n.turn_idx, f.first_turn
      FROM nums n JOIN fs f USING (conv_id, num)
      WHERE n.role = 'assistant')
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_nums,
  CAST(sum(CASE WHEN turn_idx = first_turn THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unsupported,
  CAST(CAST(sum(CASE WHEN turn_idx = first_turn THEN 1 ELSE 0 END)
            AS HUGEINT) * 1000000 // count(*) AS BIGINT)
    AS unsupported_ppm
FROM a GROUP BY 1
""")


# ---------------------------------------------------------------------------
# Session-9 ops: syndication matrix, dedup survivorship bias, temporal
# holdout with straddle audit, code-switching profile
# ---------------------------------------------------------------------------

#: planted syndication corpus: originals keep their crawl source; near-dup
#: copies (trailing-token mutation, same shape as _CORPUS_NEAR) land under
#: three 'mirror-*' sources with doc_id+100000 — i.e. LATER in crawl time
_CORPUS_SYND = """
  SELECT doc_id, text, source FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         text || ' extra trailing token' AS text,
         'mirror-' || CAST(doc_id % 3 AS STRING) AS source
  FROM documents WHERE doc_id < 200 AND doc_id % 5 < 2
"""

#: oracle fragment: the demo-profile LSH ladder (3-shingles → 8 minhashes →
#: 2 bands × 4 rows → candidate pairs) over a CTE named ``corpus``; same
#: machinery as _O_DEDUP_CANON, shared by the session-9 pair consumers
_O_BANDS_FRAG = """
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id)
"""


def _synd_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_SYND}) corpus", "documents"
    )


def q_cross_source_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup syndication matrix: LSH candidate pairs over the planted
    mirror corpus, rolled up to (source_a, source_b) cells — which crawl
    sources re-host each other's content (the audit behind
    ``source_cap``-style domain decisions). Pair→source joins are
    corpus-cardinality both sides → sort-merge pinned; one groupBy to the
    ≤|sources|² matrix; the share total is a window over that bounded
    matrix, never a second corpus pass."""
    from .operators.dedup import source_pair_matrix

    corpus = _synd_corpus(spark, sf_dir)
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    return source_pair_matrix(pairs, corpus)


_O_CROSS_SOURCE_DUP = f"""
WITH corpus AS ({_CORPUS_SYND}),
{_O_BANDS_FRAG},
lab AS (SELECT doc_id, source FROM corpus),
cells AS (SELECT least(a.source, b.source) AS source_a,
                 greatest(a.source, b.source) AS source_b,
                 CAST(count(*) AS BIGINT) AS n_pairs
          FROM prs p
          JOIN lab a ON a.doc_id = p.id_a
          JOIN lab b ON b.doc_id = p.id_b
          GROUP BY 1, 2)
SELECT source_a, source_b, n_pairs,
  CAST(CAST(n_pairs AS HUGEINT) * 1000000
       // (SELECT sum(n_pairs) FROM cells) AS BIGINT) AS share_ppm
FROM cells
"""


def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship-bias audit over the mirror corpus: per-source
    doc counts before/after keep-best canonical dedup, drop rate, and the
    signed ppm shift between corpus share and kept share. Exposes that
    keep-LONGEST favors the mirrors here (each mutated copy is 21 chars
    longer than its original, so the copy wins its cluster) — exactly the
    silent mix drift this audit exists to catch before training."""
    from .operators.dedup import (
        canonical_docs,
        connected_components,
        dedup_survivorship,
    )

    corpus = _synd_corpus(spark, sf_dir)
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs)
    scored = corpus.select(
        "doc_id", F.length("text").cast("long").alias("score")
    )
    canon = canonical_docs(scored, comp)
    return dedup_survivorship(corpus, canon)


_O_DEDUP_SURVIVORSHIP = f"""
WITH RECURSIVE corpus AS ({_CORPUS_SYND}),
{_O_BANDS_FRAG},
edges AS (SELECT id_a AS src, id_b AS dst FROM prs
          UNION SELECT id_b AS src, id_a AS dst FROM prs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
lab AS (SELECT c.doc_id, c.source,
          coalesce(m.component, c.doc_id) AS component,
          CAST(length(c.text) AS BIGINT) AS score
        FROM corpus c LEFT JOIN comp m ON m.node = c.doc_id),
win AS (SELECT component,
          first(doc_id ORDER BY score DESC, doc_id) AS canon_id
        FROM lab GROUP BY component),
k AS (SELECT l.source,
        CASE WHEN l.doc_id = w.canon_id THEN 1 ELSE 0 END AS kept
      FROM lab l JOIN win w ON l.component = w.component),
ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(kept) AS BIGINT) AS n_kept
       FROM k GROUP BY 1),
tt AS (SELECT sum(n_docs) AS td, sum(n_kept) AS tk FROM ps)
SELECT source, n_docs, n_kept,
  CAST(CAST(n_docs - n_kept AS HUGEINT) * 1000000 // n_docs AS BIGINT)
    AS drop_ppm,
  CAST(CAST(n_docs AS HUGEINT) * 1000000 // td AS BIGINT)
    AS corpus_share_ppm,
  CAST(CAST(n_kept AS HUGEINT) * 1000000 // tk AS BIGINT)
    AS kept_share_ppm,
  CAST(CAST(n_kept AS HUGEINT) * 1000000 // tk AS BIGINT)
    - CAST(CAST(n_docs AS HUGEINT) * 1000000 // td AS BIGINT) AS bias_ppm
FROM ps, tt
"""

#: temporal-split day granularity: the cutoff lands on a DAY boundary, not
#: an arbitrary row — real temporal holdouts split on a calendar unit, and
#: it is what keeps the exact-quantile histogram bounded (|days|, not
#: |rows|) at 100 TB
_TSPLIT_DAY = 64


def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout with a near-dup straddle audit: split the mirror
    corpus at the exact 80th-percentile crawl DAY (train = past, eval =
    future — the decontamination-friendly split for time-series corpora),
    then count LSH near-dup pairs straddling the boundary. The planted
    mirrors arrive 'later' (doc_id+100000), so each straddle pair is a
    future eval doc whose near-twin sits in train — the leak
    ``cluster_split`` prevents and this audit measures for a split that
    must be temporal. Cutoff via the skew-safe exact group-quantile
    histogram (bounded by |days|); pair→flag joins sort-merge pinned;
    output is one summary row."""
    from .operators.sampling import group_quantiles

    corpus = _synd_corpus(spark, sf_dir)
    days = corpus.select(
        "doc_id",
        F.floor(F.col("doc_id") / F.lit(float(_TSPLIT_DAY)))
        .cast("long")
        .alias("day"),
    )
    cut = group_quantiles(
        days.select(F.lit("all").alias("g"), F.col("day").alias("v")),
        group_col="g",
        value_col="v",
        qs=(0.8,),
    ).select(F.col("value").alias("cutoff_day"))
    flags = days.crossJoin(F.broadcast(cut)).select(
        "doc_id", (F.col("day") <= F.col("cutoff_day")).alias("is_train")
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    fa = flags.select(
        F.col("doc_id").alias("id_a"), F.col("is_train").alias("_ta")
    )
    fb = flags.select(
        F.col("doc_id").alias("id_b"), F.col("is_train").alias("_tb")
    )
    pair_stats = (
        pairs.join(fa.hint("merge"), "id_a")
        .join(fb.hint("merge"), "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                (F.col("_ta") != F.col("_tb")).cast("long")
            ).cast("long").alias("n_straddle"),
        )
    )
    split_stats = flags.agg(
        F.sum(F.col("is_train").cast("long")).cast("long").alias("n_train"),
        F.sum((~F.col("is_train")).cast("long")).cast("long").alias("n_eval"),
    )
    return (
        cut.crossJoin(split_stats)
        .crossJoin(pair_stats)
        .select(
            "cutoff_day",
            "n_train",
            "n_eval",
            "n_pairs",
            "n_straddle",
            F.expr(
                "CAST(CAST(n_straddle AS DECIMAL(38,0)) * 1000000"
                " div n_pairs AS BIGINT)"
            ).alias("straddle_ppm"),
        )
    )


_O_TEMPORAL_SPLIT = f"""
WITH corpus AS ({_CORPUS_SYND}),
{_O_BANDS_FRAG},
d AS (SELECT doc_id,
        CAST(floor(doc_id / {_TSPLIT_DAY}.0) AS BIGINT) AS day
      FROM corpus),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
cutx AS (SELECT day AS cutoff_day
         FROM (SELECT day, row_number() OVER (ORDER BY day) AS rn FROM d),
              n
         WHERE rn - 1 = CAST(floor(CAST(0.8 AS DOUBLE) * (n - 1))
                             AS BIGINT)),
fl AS (SELECT doc_id,
         day <= (SELECT cutoff_day FROM cutx) AS is_train
       FROM d),
ps AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN a.is_train <> b.is_train THEN 1 ELSE 0 END)
              AS BIGINT) AS n_straddle
       FROM prs p
       JOIN fl a ON a.doc_id = p.id_a
       JOIN fl b ON b.doc_id = p.id_b),
ss AS (SELECT
         CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
           AS n_train,
         CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
           AS n_eval
       FROM fl)
SELECT (SELECT cutoff_day FROM cutx) AS cutoff_day,
  n_train, n_eval, n_pairs, n_straddle,
  CAST(CAST(n_straddle AS HUGEINT) * 1000000 // n_pairs AS BIGINT)
    AS straddle_ppm
FROM ss, ps
"""

#: per-turn language labels under the shared conversation derivation
#: (production: the label is lang_id's pred_lang — langid_confusion is the
#: audit that says when to trust it; here the corpus's labeled column)
_LANGTURNS_SQL = f"""
SELECT 'c' || CAST(doc_id % {N_CONV} AS STRING) AS conv_id,
       CAST(floor(doc_id / {N_CONV}.0) AS INT) + 1 AS turn_idx,
       lang
FROM documents
"""


def q_lang_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching profile per conversation: turn count, distinct
    languages, adjacent-turn language switches, and the modal language
    with its exact ppm share — the screen that routes mixed-language
    conversations away from monolingual training mixes (or into a
    deliberate code-switching set). One lag window + two groupBys, all
    under the conversation partitioning; the modal pick is an
    order-insensitive ``min(struct(-cnt, lang))``, no per-conv sort."""
    from pyspark.sql import Window as W

    lt = _sql_over(spark, sf_dir, _LANGTURNS_SQL, "documents")
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    sw = lt.select(
        "conv_id", "lang", F.lag("lang").over(w).alias("_prev")
    )
    pc = sw.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull()
                & (F.col("lang") != F.col("_prev")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_switches"),
    )
    cl = lt.groupBy("conv_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    md = cl.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.min(
            F.struct((-F.col("cnt")).alias("neg"), F.col("lang"))
        ).alias("_best"),
    )
    return (
        pc.join(md, "conv_id")
        .withColumn("_top_cnt", -F.col("_best.neg"))
        .select(
            "conv_id",
            "n_turns",
            "n_langs",
            "n_switches",
            F.col("_best.lang").alias("top_lang"),
            F.expr(
                "CAST(CAST(_top_cnt AS DECIMAL(38,0)) * 1000000"
                " div n_turns AS BIGINT)"
            ).alias("top_share_ppm"),
        )
    )


_O_LANG_SWITCH = f"""
WITH lt AS ({_LANGTURNS_SQL}),
sw AS (SELECT conv_id, lang,
         lag(lang) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
       FROM lt),
pc AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(CASE WHEN prev IS NOT NULL AND lang <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
       FROM sw GROUP BY 1),
cl AS (SELECT conv_id, lang, CAST(count(*) AS BIGINT) AS cnt
       FROM lt GROUP BY 1, 2),
md AS (SELECT conv_id, lang AS top_lang, cnt AS top_cnt
       FROM (SELECT conv_id, lang, cnt,
               row_number() OVER (PARTITION BY conv_id
                 ORDER BY cnt DESC, lang ASC) AS rn
             FROM cl)
       WHERE rn = 1),
nl AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_langs
       FROM cl GROUP BY 1)
SELECT pc.conv_id, pc.n_turns, nl.n_langs, pc.n_switches, md.top_lang,
  CAST(CAST(md.top_cnt AS HUGEINT) * 1000000 // pc.n_turns AS BIGINT)
    AS top_share_ppm
FROM pc
JOIN nl ON nl.conv_id = pc.conv_id
JOIN md ON md.conv_id = pc.conv_id
"""


# ---------------------------------------------------------------------------
# Session-10 ops: encoding-health screen, corpus novelty curve, MinHash
# estimator calibration
# ---------------------------------------------------------------------------

#: planted encoding artifacts (the testdata text is clean ASCII, so the
#: screen's positives are injected deterministically): replacement chars,
#: one C0 control char, and the two mojibake lead markers — written as
#: escapes here, real characters inside the SQL both engines parse
_ENC_REPL = "�"
_ENC_CTRL = "\x01"
_ENC_MOJI = "cafÃ© âx"

_CORPUS_ENC = f"""
  SELECT doc_id,
    concat(text,
      CASE WHEN doc_id % 7 = 0 THEN ' {_ENC_MOJI}' ELSE '' END,
      CASE WHEN doc_id % 11 = 0 THEN ' {_ENC_REPL}{_ENC_REPL}' ELSE '' END,
      CASE WHEN doc_id % 13 = 0 THEN ' {_ENC_CTRL}' ELSE '' END) AS text
  FROM documents
"""


def q_encoding_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health screen over the artifact-planted corpus: U+FFFD
    replacement chars, raw C0 control chars, and UTF-8-as-Latin-1 mojibake
    markers, each an exact character count; map-only (zero shuffles)."""
    from .operators.textstats import encoding_screen

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_ENC}) corpus", "documents"
    )
    return encoding_screen(corpus)


_O_ENCODING_SCREEN = f"""
WITH corpus AS ({_CORPUS_ENC}),
c AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        CAST(length(text) - length(replace(text, '{_ENC_REPL}', ''))
             AS BIGINT) AS n_replacement,
        CAST(length(text)
             - length(regexp_replace(text,
                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'))
             AS BIGINT) AS n_ctrl,
        CAST((length(text) - length(replace(text, chr(195), '')))
             + (length(text) - length(replace(text, chr(226), '')))
             AS BIGINT) AS n_mojibake
      FROM corpus)
SELECT doc_id, n_chars, n_replacement, n_ctrl, n_mojibake,
  (n_replacement + n_ctrl + n_mojibake) = 0 AS clean
FROM c
"""

#: planted re-crawl timeline: days 0-7 carry fresh documents, days 8-11
#: carry only re-fetches of day-0-7 content — the novelty collapse the
#: curve exists to expose
_CORPUS_NOV = """
  SELECT doc_id, text, doc_id % 8 AS day FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, 8 + (doc_id % 4) AS day
  FROM documents WHERE doc_id % 3 = 0
"""


def q_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-fingerprint share per crawl day over the planted
    re-crawl timeline: one fp-domain shuffle (map-side combinable), the
    per-fp first day reuses the fp partitioning, day rollup is bounded."""
    from .operators.dedup import novelty_curve

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NOV}) corpus", "documents"
    )
    return novelty_curve(corpus)


_O_NOVELTY_CURVE = f"""
WITH corpus AS ({_CORPUS_NOV}),
fd AS (SELECT md5(text) AS fp, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_docs
       FROM corpus GROUP BY 1, 2),
fst AS (SELECT fp, min(day) AS first_day FROM fd GROUP BY 1),
pd AS (SELECT day, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_fp,
         CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_fp
       FROM fd JOIN fst USING (fp) GROUP BY 1)
SELECT day, n_docs, n_fp, n_new_fp,
  CAST(CAST(n_new_fp AS HUGEINT) * 1000000 // n_fp AS BIGINT)
    AS novelty_ppm
FROM pd
"""

#: calibration corpus: originals + exact copies (estimate 8/8, exact 1.0)
#: + trailing-token mutants (estimate varies per pair, exact just below 1)
_CORPUS_CAL = """
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         text || ' extra trailing token' AS text
  FROM documents WHERE doc_id < 300 AND doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text
  FROM documents WHERE doc_id < 300 AND doc_id % 3 = 1
"""


def q_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration over the planted copy/mutant corpus:
    per match-count band, candidate-pair count, the sketch estimate, the
    mean exact Jaccard, and the mean absolute error — all exact ppm
    integers. Pair→signature joins are pinned sort-merge (both sides
    corpus-cardinality); the rollup is ≤ K+1 rows."""
    from .operators.dedup import (
        lsh_calibration,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_CAL}) corpus", "documents"
    )
    sh = word_shingles(corpus)
    sigs = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sigs)
    return lsh_calibration(sh, sigs, pairs)


_O_LSH_CALIBRATION = f"""
WITH corpus AS ({_CORPUS_CAL}),
{_O_BANDS_FRAG},
m AS (SELECT p.id_a, p.id_b,
        CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
          AS matches
      FROM prs p
      JOIN mh a ON a.doc_id = p.id_a
      JOIN mh b ON b.doc_id = p.id_b AND b.k = a.k
      GROUP BY 1, 2),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
itr AS (SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS inter
        FROM prs p
        JOIN sh a ON a.doc_id = p.id_a
        JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2),
pp AS (SELECT m.matches,
         CAST(CAST(m.matches AS HUGEINT) * 1000000 // 8 AS BIGINT)
           AS est_ppm,
         CAST(CAST(i.inter AS HUGEINT) * 1000000
              // (za.sz + zb.sz - i.inter) AS BIGINT) AS exact_ppm
       FROM m
       JOIN itr i ON i.id_a = m.id_a AND i.id_b = m.id_b
       JOIN sz za ON za.doc_id = m.id_a
       JOIN sz zb ON zb.doc_id = m.id_b)
SELECT matches, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(CAST(matches AS HUGEINT) * 1000000 // 8 AS BIGINT) AS est_ppm,
  CAST(sum(CAST(exact_ppm AS HUGEINT)) // count(*) AS BIGINT)
    AS mean_exact_ppm,
  CAST(sum(CAST(abs(est_ppm - exact_ppm) AS HUGEINT)) // count(*)
       AS BIGINT) AS mean_abs_err_ppm
FROM pp GROUP BY 1
"""


def q_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH operating-point sweep over the near-dup corpus: for each
    (bands × rows) split of the 16-hash signatures, candidate-pair
    volume plus the sketch-estimated quality mix (strong ≥ 0.7 / junk
    < 0.3 / mean est) — the tuning table a 100 TB dedup pass derives on
    a sample before committing the band choice. ONE shared signature
    materialization, per config a banding groupBy + bucket equi-join +
    pinned SMJ match counting."""
    from .operators.dedup import lsh_band_sweep

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    sigs = minhash_signatures(word_shingles(corpus), num_hashes=16)
    return lsh_band_sweep(sigs, num_hashes=16,
                          rows_per_band_configs=(2, 4, 8))


def _o_band_sweep_cfg(r: int) -> str:
    b = 16 // r
    return f"""
bands{r} AS (SELECT doc_id, CAST(floor(k / {r}.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
prs{r} AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands{r} a JOIN bands{r} b
           ON a.band = b.band AND a.sig = b.sig
         WHERE a.doc_id < b.doc_id),
m{r} AS (SELECT p.id_a, p.id_b,
        CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
          AS matches
       FROM prs{r} p
       JOIN mh a ON a.doc_id = p.id_a
       JOIN mh b ON b.doc_id = p.id_b AND b.k = a.k
       GROUP BY 1, 2),
e{r} AS (SELECT CAST(CAST(matches AS HUGEINT) * 1000000 // 16 AS BIGINT)
          AS est FROM m{r}),
a{r} AS (SELECT CAST({r} AS INT) AS rows_per_band,
        CAST({b} AS INT) AS n_bands,
        CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(CAST(est AS HUGEINT)) // nullif(count(*), 0) AS BIGINT)
          AS mean_est_ppm,
        CAST(sum(CASE WHEN est >= 700000 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_strong,
        CAST(sum(CASE WHEN est < 300000 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_weak
       FROM e{r})"""


_O_LSH_BAND_SWEEP = (
    f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST(range(0, 16)) AS ks(k)
       GROUP BY doc_id, k),"""
    + ",".join(_o_band_sweep_cfg(r) for r in (2, 4, 8))
    + """
SELECT * FROM a2 UNION ALL SELECT * FROM a4 UNION ALL SELECT * FROM a8
"""
)


#: the near-dup corpus with provenance labels — base docs keep their
#: crawl source, the planted trailing-token copies land under 'mirror',
#: so every planted cluster is exactly 2 labels at 50/50 purity
_CORPUS_NEAR_SRC = """
  SELECT doc_id, text, source FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
    text || ' extra trailing token' AS text, 'mirror' AS source
  FROM documents WHERE doc_id < 200 AND doc_id % 5 < 2
"""


def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: size, distinct source count, majority
    source + exact-ppm purity — the attribution view that shows which
    dedup clusters are one source's re-crawls vs cross-source
    syndication families. LSH pairs → connected components → one
    AQE-decided label join + two bounded groupBys."""
    from .operators.dedup import cluster_purity, connected_components

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR_SRC}) c", "documents"
    )
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus)))
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    return cluster_purity(comp, corpus.select("doc_id", "source"))


_O_CLUSTER_PURITY = f"""
WITH RECURSIVE corpus AS ({_CORPUS_NEAR_SRC}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
mh AS (SELECT doc_id, k,
         min(md5(CAST(k AS STRING) || '|' || shingle)) AS h
       FROM sh, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS ks(k)
       GROUP BY doc_id, k),
bands AS (SELECT doc_id, CAST(floor(k / 4.0) AS INT) AS band,
            md5(string_agg(h, '' ORDER BY k)) AS sig
          FROM mh GROUP BY doc_id, 2),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
          WHERE a.doc_id < b.doc_id),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT re.node, e.dst FROM reach re JOIN edges e ON e.src = re.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
cl AS (SELECT m.component, c.source AS lab,
         CAST(count(*) AS BIGINT) AS cnt
       FROM comp m JOIN corpus c ON c.doc_id = m.node
       GROUP BY 1, 2),
pc AS (SELECT component, CAST(sum(cnt) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_labels,
         min(struct_pack(neg := -cnt, lab := lab)) AS best
       FROM cl GROUP BY 1)
SELECT component, n_docs, n_labels, best.lab AS top_label,
  CAST(CAST(-best.neg AS HUGEINT) * 1000000 // n_docs AS BIGINT)
    AS purity_ppm
FROM pc WHERE n_docs >= 2
"""


#: exact integer constants of the HLL estimate alpha_m·m²·2^57 (m=256,
#: alpha_m carries another factor of m, hence m³) — shared verbatim with
#: the DuckDB oracle so both engines divide the same numbers (see
#: operators/sketches.py for the derivation)
_HLL_NUM = 7213 * 1000 * 256 * 256 * 256 * (1 << 57)
_HLL_DEN = 10000 * (1000 * 256 + 1079)


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct word-3-gram cardinality, exact vs a
    deterministic HyperLogLog sketch — the bounded-state distinct
    counter (≤256 mergeable register rows per group) that replaces
    count(DISTINCT) shuffles at 100 TB, with the estimate's error made
    visible next to the exact baseline."""
    from .operators.sketches import hll_distinct

    docs = _docs(spark, sf_dir)
    grams = docs.filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    ).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
            )
        ).alias("gram"),
    )
    return hll_distinct(grams, group_col="lang", value_col="gram")


_O_HLL_RHO = (
    "CASE WHEN ltrim(substring(h, 3, 14), '0') = '' THEN 57"
    " ELSE 4 * (14 - length(ltrim(substring(h, 3, 14), '0')))"
    " + (CASE WHEN substring(ltrim(substring(h, 3, 14), '0'), 1, 1) = '1'"
    "         THEN 3"
    "    WHEN substring(ltrim(substring(h, 3, 14), '0'), 1, 1)"
    "         IN ('2', '3') THEN 2"
    "    WHEN substring(ltrim(substring(h, 3, 14), '0'), 1, 1)"
    "         IN ('4', '5', '6', '7') THEN 1"
    "    ELSE 0 END) + 1 END"
)

_O_HLL_DISTINCT = f"""
WITH w AS (SELECT lang, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
g AS (SELECT lang,
        array_to_string(list_slice(w, i + 1, i + 3), ' ') AS gram
      FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
k AS (SELECT lang, gram, md5(gram) AS h FROM g),
r AS (SELECT lang, substring(h, 1, 2) AS reg, ({_O_HLL_RHO}) AS rho
      FROM k),
m AS (SELECT lang, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
s AS (SELECT lang, CAST(count(*) AS INT) AS n_regs,
        CAST(max(mj) AS INT) AS rho_max,
        sum(CAST(1::BIGINT << (57 - mj) AS HUGEINT)) AS sp
      FROM m GROUP BY 1),
e AS (SELECT lang, n_regs, rho_max,
        CAST({_HLL_NUM}::HUGEINT // ({_HLL_DEN}::HUGEINT
          * (sp + (256 - n_regs)::HUGEINT
             * CAST(1::BIGINT << 57 AS HUGEINT))) AS BIGINT) AS hll_est
      FROM s),
x AS (SELECT lang, CAST(count(DISTINCT gram) AS BIGINT) AS exact_distinct
      FROM g GROUP BY 1)
SELECT x.lang, exact_distinct, hll_est, n_regs, rho_max,
  CAST(CAST(abs(hll_est - exact_distinct) AS HUGEINT) * 1000000
       // exact_distinct AS BIGINT) AS err_ppm
FROM x JOIN e USING (lang)
"""


def _grams3_by_source(df: DataFrame) -> DataFrame:
    """(source, gram) word-3-gram stream — shared by the sketch queries."""
    return df.filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    ).select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
            )
        ).alias("gram"),
    )


def q_hll_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-merge novelty between the current corpus and the simulated
    next crawl snapshot, per source: est(old), est(new), est(old ∪ new)
    from a per-register max-merge of two HLL register tables — "how much
    does the new crawl add" answered from persisted sketches without
    rescanning history — with the exact novel-gram count alongside."""
    from .operators.sketches import hll_union_novelty

    old = _docs(spark, sf_dir)
    new = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_SNAPSHOT_B}) b", "documents"
    )
    return hll_union_novelty(
        _grams3_by_source(old), _grams3_by_source(new),
        group_col="source", value_col="gram",
    )


def _o_hll_est(src: str, alias: str) -> str:
    """DuckDB macro: collapse register CTE ``src`` (source, reg, mj) into
    per-source ``{alias}`` — the same integer arithmetic as Spark."""
    return f"""SELECT source,
  CAST({_HLL_NUM}::HUGEINT // ({_HLL_DEN}::HUGEINT
    * (sum(CAST(1::BIGINT << (57 - mj) AS HUGEINT))
       + (256 - count(*))::HUGEINT
         * CAST(1::BIGINT << 57 AS HUGEINT))) AS BIGINT) AS {alias}
FROM {src} GROUP BY source"""


def _o_grams3(table: str) -> str:
    return f"""SELECT source,
  array_to_string(list_slice(w, i + 1, i + 3), ' ') AS gram
FROM (SELECT source, string_split(text, ' ') AS w FROM {table}
      WHERE len(string_split(text, ' ')) >= 3) t,
  UNNEST(range(0, len(w) - 2)) AS u(i)"""


_O_HLL_NOVELTY = f"""
WITH b AS ({_SNAPSHOT_B}),
ga AS ({_o_grams3('documents')}),
gb AS ({_o_grams3('b')}),
ra AS (SELECT source, substring(h, 1, 2) AS reg,
         max({_O_HLL_RHO}) AS mj
       FROM (SELECT source, md5(gram) AS h FROM ga) k GROUP BY 1, 2),
rb AS (SELECT source, substring(h, 1, 2) AS reg,
         max({_O_HLL_RHO}) AS mj
       FROM (SELECT source, md5(gram) AS h FROM gb) k GROUP BY 1, 2),
ru AS (SELECT coalesce(ra.source, rb.source) AS source,
         coalesce(ra.reg, rb.reg) AS reg,
         greatest(coalesce(ra.mj, 0), coalesce(rb.mj, 0)) AS mj
       FROM ra FULL JOIN rb
         ON ra.source = rb.source AND ra.reg = rb.reg),
ea AS ({_o_hll_est('ra', 'est_old')}),
eb AS ({_o_hll_est('rb', 'est_new')}),
eu AS ({_o_hll_est('ru', 'est_union')}),
xa AS (SELECT DISTINCT source, gram FROM ga),
xb AS (SELECT DISTINCT source, gram FROM gb),
xn AS (SELECT xb.source, CAST(count(*) AS BIGINT) AS c
       FROM xb LEFT JOIN xa
         ON xa.source = xb.source AND xa.gram = xb.gram
       WHERE xa.gram IS NULL GROUP BY 1)
SELECT ea.source, est_old, est_new, est_union,
  est_union - est_old AS est_novel,
  CAST(coalesce(xn.c, 0) AS BIGINT) AS exact_novel
FROM ea JOIN eb USING (source) JOIN eu USING (source)
LEFT JOIN xn USING (source)
"""


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-Bloom decontamination prefilter audit: the ≤4096-bit
    benchmark filter is a bounded broadcast artifact, the corpus-side
    membership test is two map-only broadcast joins, and the row reports
    exactly how much of the corpus the exact verify join still has to
    touch (sel_ppm) and the Bloom false-positive rate it pays for it."""
    from .operators.sketches import bloom_prefilter_audit

    corpus = _docs(spark, sf_dir)
    bench = _sql_over(spark, sf_dir, _BENCH_SET, "documents")
    return bloom_prefilter_audit(corpus, bench, n=8)


_O_BLOOM_PRUNE = f"""
WITH bench AS ({_BENCH_SET}),
cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       WHERE len(string_split(text, ' ')) >= 8),
cg AS (SELECT DISTINCT
         md5(array_to_string(list_slice(w, i + 1, i + 8), ' ')) AS gh
       FROM cw, UNNEST(range(0, len(w) - 7)) AS u(i)),
bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM bench
       WHERE len(string_split(text, ' ')) >= 8),
bg AS (SELECT DISTINCT
         md5(array_to_string(list_slice(w, i + 1, i + 8), ' ')) AS gh
       FROM bw, UNNEST(range(0, len(w) - 7)) AS u(i)),
b0 AS (SELECT DISTINCT substring(md5(gh || '#0'), 1, 3) AS p FROM bg),
b1 AS (SELECT DISTINCT substring(md5(gh || '#1'), 1, 3) AS p FROM bg),
f AS (SELECT cg.gh,
        (b0.p IS NOT NULL AND b1.p IS NOT NULL) AS cand,
        (bg.gh IS NOT NULL) AS hit
      FROM cg
      LEFT JOIN b0 ON b0.p = substring(md5(cg.gh || '#0'), 1, 3)
      LEFT JOIN b1 ON b1.p = substring(md5(cg.gh || '#1'), 1, 3)
      LEFT JOIN bg ON bg.gh = cg.gh),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus_grams,
        CAST(sum(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT)
          AS n_candidates,
        CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        CAST(sum(CASE WHEN cand AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
          AS n_false_pos
      FROM f),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bench_grams FROM bg)
SELECT n_corpus_grams, n_bench_grams, n_candidates, n_true, n_false_pos,
  CAST(CASE WHEN n_corpus_grams = n_true THEN 0
       ELSE CAST(n_false_pos AS HUGEINT) * 1000000
            // (n_corpus_grams - n_true) END AS BIGINT) AS fp_ppm,
  CAST(CAST(n_candidates AS HUGEINT) * 1000000 // n_corpus_grams
       AS BIGINT) AS sel_ppm
FROM a, nb
"""


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (LASER/CCMatrix ratio margin) between
    the even- and odd-id halves of the embedding table: per source
    vector its best target with ppm-quantized cosine, hubness-calibrated
    margin, and the mutual-best flag — the parallel-pair carver run
    across two monolingual corpora."""
    from .operators.similarity import bitext_mine

    load_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    return bitext_mine(
        emb.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 240)),
        emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 240)),
        k=4,
    )


_O_BITEXT_MINE = """
WITH av AS (SELECT vec_id AS a_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 240),
bv AS (SELECT vec_id AS b_id, CAST(embedding AS DOUBLE[]) AS v
       FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 240),
s0 AS (SELECT a_id, b_id,
         CAST(floor(list_dot_product(av.v, bv.v) /
           (sqrt(list_dot_product(av.v, av.v)) *
            sqrt(list_dot_product(bv.v, bv.v))) * 1000000) AS BIGINT)
           AS cos_ppm
       FROM av, bv),
s AS (SELECT * FROM s0 WHERE cos_ppm >= 0),
fr AS (SELECT *, row_number() OVER
         (PARTITION BY a_id ORDER BY cos_ppm DESC, b_id) AS rk FROM s),
br AS (SELECT *, row_number() OVER
         (PARTITION BY b_id ORDER BY cos_ppm DESC, a_id) AS rk FROM s),
fa AS (SELECT a_id, CAST(sum(cos_ppm) // count(*) AS BIGINT) AS favg
       FROM fr WHERE rk <= 4 GROUP BY 1),
ba AS (SELECT b_id, CAST(sum(cos_ppm) // count(*) AS BIGINT) AS bavg
       FROM br WHERE rk <= 4 GROUP BY 1),
best AS (SELECT a_id, b_id, cos_ppm FROM fr WHERE rk = 1),
bbest AS (SELECT b_id, a_id AS best_a FROM br WHERE rk = 1)
SELECT best.a_id AS src_id, best.b_id AS tgt_id, best.cos_ppm,
  CAST(CAST(best.cos_ppm AS HUGEINT) * 2000000 // (favg + bavg)
       AS BIGINT) AS margin_ppm,
  (bbest.best_a = best.a_id) AS mutual
FROM best
JOIN fa USING (a_id)
JOIN ba ON ba.b_id = best.b_id
JOIN bbest ON bbest.b_id = best.b_id
WHERE favg + bavg > 0
  AND CAST(CAST(best.cos_ppm AS HUGEINT) * 2000000 // (favg + bavg)
       AS BIGINT) >= 1050000
"""


def q_publish_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-republish plan from partition-content manifests: the
    documents table vs a planted next-version (every 23rd doc edited,
    every doc with id%97==3 dropped, every id%83==5 re-ingested under a
    new id) folds to two O(buckets) manifests whose diff names exactly
    the buckets that need re-publish — never a corpus-row join."""
    from .operators.manifest import bucket_manifest, manifest_diff

    load_views(spark, sf_dir, "documents")
    docs = spark.table("documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 97 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 23 == 0,
            F.concat(F.col("text"), F.lit(" [edited]")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 83 == 5).select(
            (F.col("doc_id") + F.lit(100_000)).alias("doc_id"), "text"
        )
    )
    return manifest_diff(
        bucket_manifest(docs, n_buckets=64),
        bucket_manifest(new, n_buckets=64),
    )


def q_span_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide extraction-contract validation over the mixed-format
    corpus (the dispatch_mix payload family): span ordering / bounds /
    plain-identity violation counts per (fmt, rule) — all expected
    zero — plus covered-vs-extracted char totals. The oracle computes
    the same rollup from the payload families' closed forms."""
    from .operators.extraction import span_lint

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    payload = (
        F.when(d % 4 == 0, F.col("text"))
        .when(
            d % 4 == 1,
            F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_SUF)),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit(_LAY_HDR),
                F.col("text"),
                F.lit(_LAY_MID),
                F.lit(_LAY_P2),
                F.lit(_LAY_SUF),
            ),
        )
        .otherwise(F.lit(""))
    )
    ex = extract_turns(docs.select("doc_id", payload.alias("text")))
    return span_lint(ex)


_O_SPAN_LINT = f"""
SELECT CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'plain' WHEN 1 THEN 'html'
            WHEN 2 THEN 'layout' ELSE 'empty' END AS fmt,
       CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'plain' WHEN 1 THEN 'article'
            WHEN 2 THEN 'layout-1col' ELSE 'empty' END AS rule,
       CAST(count(*) AS BIGINT) AS n_units,
       CAST(0 AS BIGINT) AS n_order_violations,
       CAST(0 AS BIGINT) AS n_bounds_violations,
       CAST(0 AS BIGINT) AS n_plain_violations,
       CAST(sum(CASE CAST(doc_id % 4 AS INT)
         WHEN 2 THEN length(text) + {_L_P2LEN}
         WHEN 3 THEN 0 ELSE length(text) END) AS BIGINT) AS covered_chars,
       CAST(sum(CASE CAST(doc_id % 4 AS INT)
         WHEN 2 THEN length(text) + 1 + {len(_LAY_P2)}
         WHEN 3 THEN 0 ELSE length(text) END) AS BIGINT)
         AS extracted_chars
FROM documents GROUP BY 1, 2
"""


def q_conv_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-aligned sliding training windows (48-token window, 32-token
    stride) over the derived transcripts — every window a long
    conversation yields, with whole-turn alignment."""
    from .operators.examples import conv_windows

    return conv_windows(
        spark_transcripts(spark, sf_dir),
        window_tokens=48,
        stride_tokens=32,
    )


_O_CONV_WINDOWS = oracle_cte(
    """
, toks AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      AS BIGINT) AS _n
  FROM t
),
cum AS (
  SELECT conv_id, turn_idx, _n,
    CAST(coalesce(sum(_n) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS _c0
  FROM toks
),
lims AS (
  SELECT conv_id, turn_idx, _n,
    CASE WHEN _c0 + _n <= 48 THEN CAST(0 AS BIGINT)
         ELSE (_c0 + _n - 48 + 32 - 1) // 32 END AS _wmin,
    _c0 // 32 AS _wmax
  FROM cum
),
exploded AS (
  SELECT conv_id, turn_idx, _n,
    unnest(range(_wmin, _wmax + 1)) AS win_idx
  FROM lims WHERE _wmin <= _wmax
)
SELECT conv_id, CAST(win_idx AS BIGINT) AS win_idx,
  min(turn_idx) AS first_turn, max(turn_idx) AS last_turn,
  CAST(count(*) AS BIGINT) AS n_turns, sum(_n) AS n_tokens
FROM exploded GROUP BY 1, 2
"""
)


def q_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HDR-histogram quantile registers probed at p50/p90/p99
    per language over document char counts — the fourth sketch (after
    HLL / Bloom / CMS): quantile bounds with relative error ≤ 1/8 from a
    register table at most 63·8 rows per language, map-side-combinable
    and mergeable across snapshots."""
    from .operators.sketches import hdr_quantiles

    return hdr_quantiles(
        _docs(spark, sf_dir), "n_chars", group_col="lang",
        probs_pct=(50, 90, 99), sub_buckets=8,
    )


_O_HDR_QUANTILES = """
WITH v AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
),
b AS (
  SELECT lang, CASE WHEN v < 1 THEN 0 ELSE length(bin(v)) END AS e, v
  FROM v
),
s AS (
  SELECT lang, e,
    CASE WHEN e = 0 THEN 0
      ELSE CAST((v - (CAST(1 AS BIGINT) << (e - 1)))
        // greatest((CAST(1 AS BIGINT) << (e - 1)) // 8, 1) AS INT)
    END AS sub
  FROM b
),
regs AS (
  SELECT lang, e, sub, CAST(count(*) AS BIGINT) AS n
  FROM s GROUP BY 1, 2, 3
),
cum AS (
  SELECT lang, e, sub, n,
    CAST(sum(n) OVER (PARTITION BY lang ORDER BY e, sub) AS BIGINT)
      AS _cum,
    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS _tot
  FROM regs
),
probed AS (
  SELECT lang, e, sub, n, _cum, _tot, pct
  FROM cum CROSS JOIN (SELECT unnest([50, 90, 99]) AS pct) p
  WHERE _cum >= (pct * _tot + 99) // 100
    AND _cum - n < (pct * _tot + 99) // 100
)
SELECT lang, CAST(pct AS INT) AS pct,
  CASE WHEN e = 0 THEN CAST(0 AS BIGINT)
    ELSE (CAST(1 AS BIGINT) << (e - 1))
      + sub * greatest((CAST(1 AS BIGINT) << (e - 1)) // 8, 1)
  END AS q_lo,
  CASE WHEN e = 0 THEN CAST(0 AS BIGINT)
    WHEN (CAST(1 AS BIGINT) << (e - 1)) < 8
      THEN (CAST(1 AS BIGINT) << (e - 1)) + sub
    ELSE (CAST(1 AS BIGINT) << (e - 1))
      + (sub + 1) * greatest((CAST(1 AS BIGINT) << (e - 1)) // 8, 1) - 1
  END AS q_hi,
  _tot AS n_total
FROM probed
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible multi-epoch shuffle-order audit over the documents
    corpus: 3 epochs × 16 hash shards, each row the shard's doc count,
    key range, and permutation fingerprint — the deterministic
    data-order layer (same seed ⇒ identical batch order; new epoch ⇒
    fresh permutation) that partition-dependent ``orderBy(rand())``
    cannot provide."""
    from .operators.sampling import epoch_shuffle_audit

    return epoch_shuffle_audit(
        _docs(spark, sf_dir), n_epochs=3, id_col="doc_id", seed=0,
    )


_O_EPOCH_SHUFFLE = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
k AS (
  SELECT id, epoch,
    substring(md5(CAST(id AS VARCHAR) || ':s:0'), 1, 1) AS shard,
    substring(md5(CAST(id AS VARCHAR) || ':e'
      || CAST(epoch AS VARCHAR) || ':0'), 1, 8) AS _key
  FROM d CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e
),
pos AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY epoch, shard ORDER BY _key, id) AS BIGINT) AS pos
  FROM k
)
SELECT CAST(epoch AS INT) AS epoch, shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  min(_key) AS min_key, max(_key) AS max_key,
  CAST(sum(((pos % 1000000007) * (id % 1000000007)) % 1000000007)
    % 1000000007 AS BIGINT) AS order_fp
FROM pos GROUP BY 1, 2
"""


def q_trunc_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-budget truncation policy audit (64-token budget): what
    head-keep / tail-keep / drop-middle truncation each retain of the
    transcripts — turns, tokens, assistant tokens, exact retention ppm,
    conversations that fit whole."""
    from .operators.examples import truncation_audit

    return truncation_audit(spark_transcripts(spark, sf_dir), 64)


_O_TRUNC_POLICY = oracle_cte(
    """
, toks AS (
  SELECT conv_id, turn_idx, role = 'assistant' AS _asst,
    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      AS BIGINT) AS _n
  FROM t
),
c AS (
  SELECT conv_id, _n, _asst,
    sum(_n) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cf,
    sum(_n) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _cb
  FROM toks
),
pc AS (
  SELECT conv_id, sum(_n) AS _tot,
    sum(CASE WHEN _cf <= 64 THEN 1 ELSE 0 END) AS _turns_head,
    sum(CASE WHEN _cf <= 64 THEN _n ELSE 0 END) AS _tok_head,
    sum(CASE WHEN _cf <= 64 AND _asst THEN _n ELSE 0 END) AS _atok_head,
    sum(CASE WHEN _cb <= 64 THEN 1 ELSE 0 END) AS _turns_tail,
    sum(CASE WHEN _cb <= 64 THEN _n ELSE 0 END) AS _tok_tail,
    sum(CASE WHEN _cb <= 64 AND _asst THEN _n ELSE 0 END) AS _atok_tail,
    sum(CASE WHEN _cf <= 32 OR _cb <= 32 THEN 1 ELSE 0 END)
      AS _turns_edges,
    sum(CASE WHEN _cf <= 32 OR _cb <= 32 THEN _n ELSE 0 END)
      AS _tok_edges,
    sum(CASE WHEN (_cf <= 32 OR _cb <= 32) AND _asst THEN _n ELSE 0 END)
      AS _atok_edges
  FROM c GROUP BY conv_id
),
up AS (
  SELECT 'head' AS policy, _tot, _turns_head AS _turns,
    _tok_head AS _tok, _atok_head AS _atok FROM pc
  UNION ALL SELECT 'tail', _tot, _turns_tail, _tok_tail, _atok_tail
  FROM pc
  UNION ALL SELECT 'edges', _tot, _turns_edges, _tok_edges, _atok_edges
  FROM pc
)
SELECT policy, CAST(count(*) AS BIGINT) AS n_convs,
  CAST(sum(CASE WHEN _tok = _tot THEN 1 ELSE 0 END) AS BIGINT)
    AS convs_fit,
  CAST(sum(_turns) AS BIGINT) AS n_turns_kept,
  CAST(sum(_tok) AS BIGINT) AS n_tokens_kept,
  CAST(sum(_atok) AS BIGINT) AS asst_tokens_kept,
  CAST(CAST(sum(_tok) AS HUGEINT) * 1000000
    // greatest(sum(_tot), 1) AS BIGINT) AS tokens_kept_ppm
FROM up GROUP BY policy
"""
)


def q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template serialization audit: per conversation, the rendered
    length and the loss-mask (assistant) span accounting from the
    chat_spans offset table — the span table is the deliverable (the
    writer re-derives byte offsets at materialization); nothing here
    concatenates a conversation into one row."""
    from .operators.examples import chat_render_report, chat_spans

    return chat_render_report(chat_spans(spark_transcripts(spark, sf_dir)))


_O_CHAT_RENDER = oracle_cte(
    """
, blk AS (
  SELECT conv_id, turn_idx, role,
    role = 'assistant' AS trainable,
    CAST(length(role) + 5 AS BIGINT) AS _hdr,
    CAST(length(coalesce(text, '')) AS BIGINT) AS _len,
    CAST(length(role) + 6 + length(coalesce(text, '')) AS BIGINT) AS _blk
  FROM t
),
off AS (
  SELECT conv_id, trainable, _hdr, _len, _blk,
    CAST(coalesce(sum(_blk) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS _before
  FROM blk
),
sp AS (
  SELECT conv_id, trainable,
    _before + _hdr AS text_start,
    _before + _hdr + _len AS text_end,
    _before + _blk AS block_end
  FROM off
)
SELECT conv_id,
  CAST(max(block_end) AS BIGINT) AS rendered_chars,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(CASE WHEN trainable THEN 1 ELSE 0 END) AS BIGINT)
    AS n_trainable,
  CAST(sum(CASE WHEN trainable THEN text_end - text_start ELSE 0 END)
    AS BIGINT) AS trainable_chars,
  CAST(sum(((text_start % 1000000007) * 1000003
    + (text_end % 1000000007)) % 1000000007) % 1000000007 AS BIGINT)
    AS spans_fp
FROM sp GROUP BY conv_id
"""
)


def q_maxlen_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-budget tuning curve: padding/overflow/fill-ppm at four
    candidate context budgets in ONE corpus pass — all budgets derive
    their pack boundaries from the same exclusive prefix sum under the
    same shard window."""
    from .operators.sampling import maxlen_sweep, shard_assign

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return maxlen_sweep(
        shard_assign(with_tokens, n_shards=8, seed=0),
        budgets=(200, 500, 1000, 2000),
    )


_O_MAXLEN_SWEEP = """
WITH s AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 2) AS h2
  FROM documents),
sh AS (SELECT doc_id, n_tokens,
    CAST((ascii(substr(h2, 1, 1)) * 256 + ascii(substr(h2, 2, 1))) % 8
      AS INT) AS shard
  FROM s),
pre AS (SELECT shard, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS BIGINT) AS _before
  FROM sh),
g AS (SELECT CAST(budget AS BIGINT) AS budget, shard,
    _before // budget AS _pack, n_tokens
  FROM pre CROSS JOIN (SELECT unnest([200, 500, 1000, 2000]) AS budget) b),
pp AS (SELECT budget, shard, _pack,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS tok
  FROM g GROUP BY 1, 2, 3)
SELECT budget,
  CAST(count(*) AS BIGINT) AS n_packs,
  CAST(sum(n_docs) AS BIGINT) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS used_tokens,
  CAST(count(*) * budget AS BIGINT) AS capacity,
  CAST(sum(greatest(budget - tok, 0)) AS BIGINT) AS pad_tokens,
  CAST(sum(greatest(tok - budget, 0)) AS BIGINT) AS overflow_tokens,
  CAST(CAST(sum(least(tok, budget)) AS HUGEINT) * 1000000
       // (count(*) * budget) AS BIGINT) AS fill_ppm
FROM pp GROUP BY budget
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget coverage curve over the documents token stream:
    exact token-coverage and OOV ppm at candidate vocabulary sizes
    (10 / 100 / 100000 — the last one past the corpus vocabulary to
    exercise the full-coverage branch), computed skew-free over the
    count-of-counts domain."""
    from .operators.textstats import vocab_coverage

    return vocab_coverage(
        _docs(spark, sf_dir), vocab_sizes=(10, 100, 100_000)
    )


_O_VOCAB_COVERAGE = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
pt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt
  FROM toks WHERE term <> '' GROUP BY term
),
coc AS (SELECT cnt, CAST(count(*) AS BIGINT) AS m FROM pt GROUP BY cnt),
cum AS (
  SELECT cnt, m,
    CAST(coalesce(sum(m) OVER (ORDER BY cnt DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS types_before,
    CAST(coalesce(sum(m * cnt) OVER (ORDER BY cnt DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tokens_before,
    CAST(sum(m * cnt) OVER () AS BIGINT) AS total_tokens,
    CAST(sum(m) OVER () AS BIGINT) AS vocab_total
  FROM coc
),
hit AS (
  SELECT * FROM cum CROSS JOIN (
    SELECT CAST(unnest([10, 100, 100000]) AS BIGINT) AS vocab_size) v
  WHERE (types_before < vocab_size AND types_before + m >= vocab_size)
     OR (vocab_size > vocab_total AND types_before + m = vocab_total)
)
SELECT vocab_size, vocab_total,
  CAST(tokens_before + least(vocab_size - types_before, m) * cnt
    AS BIGINT) AS covered_tokens,
  total_tokens,
  CAST(CAST(tokens_before + least(vocab_size - types_before, m) * cnt
    AS HUGEINT) * 1000000 // total_tokens AS BIGINT) AS coverage_ppm,
  CAST(1000000 - CAST(tokens_before
    + least(vocab_size - types_before, m) * cnt
    AS HUGEINT) * 1000000 // total_tokens AS BIGINT) AS oov_ppm
FROM hit
"""


def q_pack_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-purity histogram of the contiguous packing: per
    distinct-source count, how many packs and the exact dominant-source
    token share — the attention-contamination exposure of packing
    without a block-diagonal mask."""
    from .operators.sampling import pack_mixing, shard_assign

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_mixing(
        shard_assign(with_tokens, n_shards=8, seed=0),
        budget=_PACK_BUDGET,
    )


_O_PACK_MIXING = f"""
WITH s AS (SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 2) AS h2
  FROM documents),
sh AS (SELECT doc_id, source, n_tokens,
    CAST((ascii(substr(h2, 1, 1)) * 256 + ascii(substr(h2, 2, 1))) % 8
      AS INT) AS shard
  FROM s),
p AS (SELECT shard, source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS BIGINT) // {_PACK_BUDGET} AS pack_id
  FROM sh),
ps AS (SELECT shard, pack_id, source,
    CAST(count(*) AS BIGINT) AS docs,
    CAST(sum(n_tokens) AS BIGINT) AS stok
  FROM p GROUP BY 1, 2, 3),
pp AS (SELECT shard, pack_id,
    CAST(count(*) AS BIGINT) AS n_sources,
    CAST(sum(docs) AS BIGINT) AS docs,
    CAST(sum(stok) AS BIGINT) AS ptok,
    CAST(max(stok) AS BIGINT) AS top
  FROM ps GROUP BY 1, 2)
SELECT n_sources,
  CAST(count(*) AS BIGINT) AS n_packs,
  CAST(sum(docs) AS BIGINT) AS n_docs,
  CAST(sum(ptok) AS BIGINT) AS pack_tokens,
  CAST(sum(top) AS BIGINT) AS top_source_tokens,
  CAST(CAST(sum(top) AS HUGEINT) * 1000000
    // greatest(sum(ptok), 1) AS BIGINT) AS purity_ppm
FROM pp GROUP BY n_sources
"""

#: data_budget demo parameters: target training budget (tokens) and the
#: Muennighoff-style repeat cap (4 epochs, x1000)
_BUDGET_TOKENS = 5_000_000
_REPEAT_CAP_X1000 = 4_000


def q_data_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epochs-to-exhaustion planner: per language, the tokens a 5M-token
    training budget demands of it under the α=0.5 temperature mixture,
    the epochs of its available data that implies, and whether it
    crosses the 4-epoch repeat cap (Muennighoff et al. 2305.16264)."""
    from .operators.sampling import data_budget

    return data_budget(
        _docs(spark, sf_dir),
        budget_tokens=_BUDGET_TOKENS,
        repeat_cap_x1000=_REPEAT_CAP_X1000,
    )


_O_DATA_BUDGET = f"""
WITH mw AS ({_O_MIX_WEIGHTS}),
d AS (SELECT lang, n_tokens, w_ppm,
    CAST(CAST(w_ppm AS HUGEINT) * {_BUDGET_TOKENS} // 1000000 AS BIGINT)
      AS demand_tokens
  FROM mw),
e AS (SELECT *,
    CAST(CAST(demand_tokens AS HUGEINT) * 1000
      // greatest(n_tokens, 1) AS BIGINT) AS epochs_x1000
  FROM d)
SELECT lang, n_tokens, w_ppm, demand_tokens, epochs_x1000,
  epochs_x1000 > {_REPEAT_CAP_X1000} AS over_cap
FROM e
"""


def q_pii_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-turn PII re-identification audit over the derived
    transcripts: the phone values seeded by the corpus construction
    are regex-extracted on the Spark side, while the oracle derives
    the expected values closed-form from ``doc_id`` — so the row is a
    ground-truth check of the extraction regex itself."""
    from .operators.textstats import pii_spread

    return pii_spread(spark_transcripts(spark, sf_dir))


_O_PII_SPREAD = oracle_cte("""
, p AS (SELECT conv_id, turn_idx,
    '555-01' || lpad(CAST(doc_id % 100 AS STRING), 2, '0') AS pii_value
  FROM t WHERE doc_id % 8 = 5),
v AS (SELECT conv_id, pii_value,
    CAST(count(DISTINCT turn_idx) AS BIGINT) AS n_turns,
    CAST(count(*) AS BIGINT) AS n_hits,
    min(turn_idx) AS first_t, max(turn_idx) AS last_t
  FROM p GROUP BY 1, 2)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_values,
  CAST(sum(n_hits) AS BIGINT) AS n_hits,
  CAST(sum(CASE WHEN n_turns > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_repeated,
  CAST(max(last_t - first_t) AS BIGINT) AS max_spread
FROM v GROUP BY conv_id
""")

#: dialect-neutral tool-call argument payload over the derived
#: transcripts' tool turns: valid JSON in the common case, an unclosed
#: object on doc_id % 17 = 3 (malformed), a dropped required "k" key on
#: doc_id % 19 = 5 — the oracle never parses JSON, it re-derives the
#: verdicts from the same modular conditions, making the query a
#: ground-truth check of Spark's JVM-side JSON path reader
_TOOL_ARGS_SQL = (
    "CASE WHEN doc_id % 17 = 3 THEN"
    " '{\"query\": \"q' || CAST(doc_id % 50 AS STRING) || '\", \"k\": '"
    " || CAST(doc_id % 10 AS STRING)"
    " WHEN doc_id % 19 = 5 THEN"
    " '{\"query\": \"q' || CAST(doc_id % 50 AS STRING) || '\"}'"
    " ELSE"
    " '{\"query\": \"q' || CAST(doc_id % 50 AS STRING) || '\", \"k\": '"
    " || CAST(doc_id % 10 AS STRING) || '}' END"
)

_TOOL_NAME_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'search' WHEN 1 THEN 'browse'"
    " ELSE 'calc' END"
)


def q_tool_call_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent tool-call schema validation: per tool, calls whose JSON
    argument payload is malformed or omits a required argument, with
    the exact ok-ppm admission rate (see
    :func:`~poc_document_ocr_spark.operators.examples.tool_call_lint`)."""
    from .operators.examples import tool_call_lint

    calls = (
        spark_transcripts(spark, sf_dir)
        .filter("doc_id % 4 = 3")
        .selectExpr(
            f"{_TOOL_NAME_SQL} AS tool", f"{_TOOL_ARGS_SQL} AS args"
        )
    )
    return tool_call_lint(calls, required=("query", "k"))


_O_TOOL_CALL_LINT = oracle_cte(f"""
, c AS (SELECT {_TOOL_NAME_SQL} AS tool,
    CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END AS malformed,
    CASE WHEN doc_id % 17 <> 3 AND doc_id % 19 = 5 THEN 1 ELSE 0 END
      AS missing
  FROM t WHERE doc_id % 4 = 3)
SELECT tool,
  CAST(count(*) AS BIGINT) AS n_calls,
  CAST(sum(malformed) AS BIGINT) AS n_malformed,
  CAST(sum(missing) AS BIGINT) AS n_missing,
  CAST(CAST(count(*) - sum(malformed) - sum(missing) AS HUGEINT)
    * 1000000 // count(*) AS BIGINT) AS ok_ppm
FROM c GROUP BY tool
""")


def q_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus statistics via mergeable moment registers:
    the corpus is split into a 'yesterday' slice and a 'delta' batch
    (``doc_id % 5``), each folded independently to per-language
    ``(n, sum, sumsq, min, max)`` registers, then MERGED — while the
    oracle computes the same registers directly over the full corpus
    in one pass. Equality IS the algebraic-merge invariant: daily
    ingest updates corpus stats from yesterday's persisted registers
    plus the delta's, never a rescan of history."""
    from .operators.sketches import merge_moments, moment_registers

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    old = moment_registers(docs.filter("doc_id % 5 != 0"))
    delta = moment_registers(docs.filter("doc_id % 5 = 0"))
    merged = merge_moments(old, delta)
    return merged.select(
        "lang",
        "n",
        "sum",
        "sumsq",
        "min",
        "max",
        F.expr(
            "CAST(CAST(sum AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("mean_tokens_ppm"),
    )


_O_STATS_MERGE = """
WITH d AS (SELECT lang,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(n_tokens) AS BIGINT) AS sum,
  sum(CAST(n_tokens AS HUGEINT) * CAST(n_tokens AS HUGEINT)) AS sumsq,
  CAST(min(n_tokens) AS BIGINT) AS min,
  CAST(max(n_tokens) AS BIGINT) AS max,
  CAST(CAST(sum(n_tokens) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
    AS mean_tokens_ppm
FROM d GROUP BY lang
"""


def q_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter audit over the documents token stream:
    the d×w counter sketch (the only full-stream pass), probed with the
    vocabulary of a deterministic 1-in-8 doc sample, top-20 by estimate
    with the measured one-sided overestimate."""
    from .operators.sketches import cms_heavy_audit

    docs = _docs(spark, sf_dir)
    stream = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cands = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return cms_heavy_audit(stream, cands, d=4, w=512, k=20)


_O_CMS_HEAVY = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
cand AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id % 8 = 0
),
js AS (SELECT unnest([0, 1, 2, 3]) AS cms_row),
cms AS (
  SELECT cms_row,
    ('0x' || substr(md5(token || '|' || cms_row::VARCHAR), 1, 15))::BIGINT
      % 512 AS cms_col,
    count(*) AS n
  FROM toks CROSS JOIN js GROUP BY 1, 2
),
est AS (
  SELECT cand.token AS _v, min(coalesce(cms.n, 0)) AS cms_est
  FROM cand CROSS JOIN js
  LEFT JOIN cms ON cms.cms_row = js.cms_row
    AND cms.cms_col = ('0x' || substr(md5(cand.token || '|'
      || js.cms_row::VARCHAR), 1, 15))::BIGINT % 512
  GROUP BY 1
),
exact AS (SELECT token AS _v, count(*) AS exact_n FROM toks GROUP BY 1),
ranked AS (
  SELECT est._v, cms_est, coalesce(exact_n, 0) AS exact_n,
    row_number() OVER (ORDER BY cms_est DESC, est._v) AS _rk
  FROM est LEFT JOIN exact ON est._v = exact._v
)
SELECT _v AS token, cms_est, exact_n,
  CAST(CAST(cms_est - exact_n AS HUGEINT) * 1000000
    // greatest(exact_n, 1) AS BIGINT) AS over_ppm
FROM ranked WHERE _rk <= 20
"""


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-script homoglyph screen over the documents table with a
    planted confusable spoof: every 13th doc gets its Latin 'e'
    replaced by Cyrillic 'е' — invisible to the eye, flagged by the
    per-word two-script probe."""
    from .operators.textstats import script_mix

    load_views(spark, sf_dir, "documents")
    docs = spark.table("documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.replace(F.col("text"), F.lit("e"), F.lit("е")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return script_mix(docs)


_O_SCRIPT_MIX = """
WITH d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 13 = 0 THEN replace(text, 'e', 'е') ELSE text END
      AS text
  FROM documents
),
m AS (
  SELECT doc_id, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
    CAST(len(list_filter(string_split(text, ' '),
      w -> regexp_matches(w, '[A-Za-z]')
       AND regexp_matches(w, '[Ѐ-ӿ]'))) AS BIGINT) AS n_mixed_words
  FROM d
)
SELECT doc_id, n_words,
  CAST(length(text)
    - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT)
    AS n_latin_chars,
  CAST(length(text)
    - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS BIGINT)
    AS n_cyrillic_chars,
  n_mixed_words,
  CAST(CAST(n_mixed_words AS HUGEINT) * 1000000
    // greatest(n_words, 1) AS BIGINT) AS mixed_ppm,
  (n_mixed_words = 0) AS clean
FROM m
"""


_O_PUBLISH_DIFF = """
WITH oldv AS (SELECT doc_id, text FROM documents),
newv AS (
  SELECT doc_id,
    CASE WHEN doc_id % 23 = 0 THEN text || ' [edited]' ELSE text END AS text
  FROM documents WHERE doc_id % 97 <> 3
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 83 = 5
),
mo AS (
  SELECT ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 64 AS bucket,
    count(*) AS n_rows,
    bit_xor(('0x'||substr(md5(doc_id::VARCHAR || chr(1) || text),1,15))::BIGINT)
      AS content_sig
  FROM oldv GROUP BY 1
),
mn AS (
  SELECT ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 64 AS bucket,
    count(*) AS n_rows,
    bit_xor(('0x'||substr(md5(doc_id::VARCHAR || chr(1) || text),1,15))::BIGINT)
      AS content_sig
  FROM newv GROUP BY 1
)
SELECT COALESCE(mo.bucket, mn.bucket) AS bucket,
  CASE WHEN mo.bucket IS NULL THEN 'added'
       WHEN mn.bucket IS NULL THEN 'removed'
       ELSE 'changed' END AS status,
  mo.n_rows AS n_rows_old, mn.n_rows AS n_rows_new
FROM mo FULL OUTER JOIN mn ON mo.bucket = mn.bucket
WHERE mo.bucket IS NULL OR mn.bucket IS NULL
   OR mo.content_sig <> mn.content_sig OR mo.n_rows <> mn.n_rows
"""


#: crawl timeline with planted late-day quality decay: every third doc on
#: days 6-7 is replaced by a 3-token punctuation stub (fails the Gopher
#: min-token rule deterministically) — the "site broke mid-crawl" signal
#: day = (doc_id div 20) mod 8 — the quotient decorrelates the day from
#: the id-derived source (plain doc_id % 8 shares residues with source
#: and collapses to 2 days per source); floor() parses identically in
#: Spark SQL and DuckDB (CAST of a double truncates in Spark but ROUNDS
#: in DuckDB — floor first is the portable form)
_CORPUS_QD = """
  SELECT doc_id, source, text,
    CAST(floor(doc_id / 20) AS BIGINT) % 8 AS day FROM documents
  WHERE NOT (CAST(floor(doc_id / 20) AS BIGINT) % 8 >= 6
             AND doc_id % 3 = 0)
  UNION ALL
  SELECT doc_id, source, '!!! ?? !!' AS text,
    CAST(floor(doc_id / 20) AS BIGINT) % 8 AS day
  FROM documents
  WHERE CAST(floor(doc_id / 20) AS BIGINT) % 8 >= 6 AND doc_id % 3 = 0
"""


def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-screen drift over crawl days: overall keep
    ppm, worst-deviating day + its keep ppm, max day-level deviation —
    the alert that a source's quality fell off a cliff mid-timeline
    while the corpus mix still looked stable."""
    from .operators.textstats import quality_drift, quality_keep

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_QD}) c", "documents"
    )
    labeled = corpus.select(
        "source", "day", quality_keep(F.col("text")).alias("keep")
    )
    return quality_drift(labeled, group_col="source", day_col="day")


_O_QUALITY_DRIFT = f"""
WITH c AS ({_CORPUS_QD}),
s AS (SELECT source, day,
        (len(string_split(text, ' ')) >= 5
         AND len(string_split(text, ' ')) <= 100000
         AND length(replace(text, ' ', ''))
             / len(string_split(text, ' ')) >= 2.0
         AND length(replace(text, ' ', ''))
             / len(string_split(text, ' ')) <= 12.0
         AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
             / length(text) <= 0.30
         AND length(regexp_replace(text, '[^0-9]', '', 'g'))
             / length(text) <= 0.50) AS keep
      FROM c),
gd AS (SELECT source, day, CAST(count(*) AS BIGINT) AS _n,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS _k
       FROM s GROUP BY 1, 2),
tot AS (SELECT source, CAST(count(*) AS INT) AS n_days,
          CAST(sum(_n) AS BIGINT) AS n_docs,
          CAST(CAST(sum(_k) AS HUGEINT) * 1000000 // sum(_n) AS BIGINT)
            AS keep_ppm
        FROM gd GROUP BY 1),
dev AS (SELECT gd.source, CAST(day AS BIGINT) AS day,
          CAST(CAST(_k AS HUGEINT) * 1000000 // _n AS BIGINT) AS day_ppm,
          keep_ppm
        FROM gd JOIN tot USING (source)),
w AS (SELECT source,
        min(struct_pack(neg := -abs(day_ppm - keep_ppm), day := day,
                        ppm := day_ppm)) AS b
      FROM dev GROUP BY 1)
SELECT tot.source, n_days, n_docs, keep_ppm,
  b.day AS worst_day, b.ppm AS worst_day_ppm,
  CAST(-b.neg AS BIGINT) AS max_dev_ppm
FROM tot JOIN w USING (source)
"""


#: score corpus for the calibration demo — integer group from doc_id and a
#: group-SHIFTED score (n_chars mod 97 + 25·group) so every group has a
#: different raw-score location: one global raw cutoff keeps wildly
#: different shares per group, which is exactly the problem per-source
#: ECDF calibration exists to fix
_CORPUS_SCAL = (
    "SELECT doc_id % 4 AS src,"
    " (n_chars % 97) + 25 * (doc_id % 4) AS score FROM documents"
)

#: global raw cutoff / calibrated percentile target for the demo
_CAL_RAW_CUTOFF = 60
_CAL_TARGET_PPM = 800_000


def q_score_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ECDF score calibration report: a global raw cutoff's
    keep share per source (wildly uneven by construction) vs the
    calibrated percentile cutoff's (equalized), plus each source's
    implied effective raw-score cutoff — the cross-source score
    normalization step that runs before any global quality threshold
    (CCNet-style per-bucket ranking, Wenzek et al. 1911.00359)."""
    from .operators.textstats import calibrate_scores, calibration_report

    c = _sql_over(spark, sf_dir, _CORPUS_SCAL, "documents")
    m = calibrate_scores(c, group_col="src", score_col="score")
    return calibration_report(
        m, raw_cutoff=_CAL_RAW_CUTOFF, target_ppm=_CAL_TARGET_PPM,
        group_col="src",
    )


_O_SCORE_CALIBRATE = f"""
WITH c AS ({_CORPUS_SCAL}),
h AS (SELECT src, CAST(score AS BIGINT) AS score,
        CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1, 2),
m AS (SELECT src, score, cnt,
        CAST(sum(cnt) OVER (PARTITION BY src ORDER BY score)
             AS BIGINT) AS cum,
        CAST(sum(cnt) OVER (PARTITION BY src) AS BIGINT) AS n FROM h),
mm AS (SELECT src, score, cnt, n,
         CASE WHEN n > 1 THEN
           CAST(CAST(cum - cnt AS HUGEINT) * 1000000 // (n - 1)
                AS BIGINT)
         ELSE 0 END AS cal_ppm FROM m),
tot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_scores FROM mm GROUP BY 1),
raw AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS k FROM mm
        WHERE score >= {_CAL_RAW_CUTOFF} GROUP BY 1),
cut AS (SELECT src, min(score) AS cal_cutoff FROM mm
        WHERE cal_ppm >= {_CAL_TARGET_PPM} GROUP BY 1),
calk AS (SELECT mm.src, CAST(sum(cnt) AS BIGINT) AS k FROM mm
         JOIN cut ON mm.src = cut.src AND mm.score >= cut.cal_cutoff
         GROUP BY 1)
SELECT tot.src AS src, n_docs, n_scores,
  CAST(CAST(coalesce(raw.k, 0) AS HUGEINT) * 1000000 // n_docs
       AS BIGINT) AS raw_keep_ppm,
  cut.cal_cutoff AS cal_cutoff,
  CAST(CAST(coalesce(calk.k, 0) AS HUGEINT) * 1000000 // n_docs
       AS BIGINT) AS cal_keep_ppm
FROM tot
LEFT JOIN raw ON tot.src = raw.src
LEFT JOIN cut ON tot.src = cut.src
LEFT JOIN calk ON tot.src = calk.src
"""


#: annotation budget for the quota-allocation demo — deliberately prime
#: so floors never sum to k and the largest-remainder seats are exercised
_QUOTA_K = 137


def q_quota_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation of a fixed 137-item
    annotation budget across sources, proportional to size — the exact
    integer allocation sheet (floor quotas + leftover seats to largest
    remainders) behind fixed-total eval carves."""
    from .operators.sampling import quota_allocation

    docs = _docs(spark, sf_dir)
    return quota_allocation(docs, k=_QUOTA_K, strata_col="source")


_O_QUOTA_ALLOC = f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows
           FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS _n FROM c),
b AS (SELECT source, n_rows,
        CAST(CAST(n_rows AS HUGEINT) * {_QUOTA_K} // _n AS BIGINT)
          AS quota_floor,
        CAST(CAST(n_rows AS HUGEINT) * {_QUOTA_K} % _n AS BIGINT)
          AS remainder
      FROM c, t),
r AS (SELECT *,
        row_number() OVER (ORDER BY remainder DESC, source) AS rk,
        {_QUOTA_K} - sum(quota_floor) OVER () AS leftover
      FROM b)
SELECT source, n_rows, quota_floor, remainder,
  CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS INT) AS extra,
  CAST(quota_floor + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
       AS BIGINT) AS quota
FROM r
"""


def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus datasheet in one row — the release-card numbers
    (Datasheets for Datasets, Gebru et al. 1803.09010) a training run
    records next to every corpus snapshot: volume (docs, tokens), exact
    dedup rate, the three screen pass-rates (Gopher quality, blocklist,
    encoding health), and the language mix (count + top language with
    its exact ppm share).

    Composition shape: ONE per-doc projection evaluates every map-only
    signal (tokens, three screens, lang, content fingerprint) and is
    checkpointed lazily (the curate_pipeline convention) because TWO
    aggregates consume it — the global fold (with its two-phase
    count(distinct fp)) and the bounded lang rollup; without the
    checkpoint each would re-run the screens over the full text. All
    ratios are exact ppm integers.
    """
    from .operators.textstats import (
        CTRL_CHAR_RE,
        MOJIBAKE_MARKERS,
        blocklist_keep,
        quality_keep,
    )

    docs = _docs(spark, sf_dir)
    text = F.col("text")
    n_chars = F.length(text).cast("long")

    def _cnt(marker: str):
        return (
            n_chars - F.length(F.replace(text, F.lit(marker)))
        ).cast("long")

    n_ctrl = (
        n_chars - F.length(F.regexp_replace(text, CTRL_CHAR_RE, ""))
    ).cast("long")
    clean = (
        _cnt("�")
        + n_ctrl
        + _cnt(MOJIBAKE_MARKERS[0])
        + _cnt(MOJIBAKE_MARKERS[1])
    ) == F.lit(0)
    per_doc = docs.select(
        F.size(F.split(text, " ")).cast("long").alias("n_tokens"),
        quality_keep(text).cast("int").alias("q"),
        blocklist_keep(text).cast("int").alias("b"),
        clean.cast("int").alias("e"),
        F.col("lang"),
        F.md5(text).alias("fp"),
    ).localCheckpoint(eager=False)
    fold = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("fp").cast("long").alias("n_unique_docs"),
        F.sum("q").cast("long").alias("_nq"),
        F.sum("b").cast("long").alias("_nb"),
        F.sum("e").cast("long").alias("_ne"),
    )
    lang = (
        per_doc.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.min(
                F.struct(
                    (-F.col("_cnt")).alias("neg"), F.col("lang")
                )
            ).alias("_best"),
        )
        .select(
            "n_langs",
            F.col("_best.lang").alias("top_lang"),
            (-F.col("_best.neg")).cast("long").alias("_top_cnt"),
        )
    )
    ppm = lambda num, den: F.expr(
        f"CAST(CAST({num} AS DECIMAL(38,0)) * 1000000 div {den}"
        f" AS BIGINT)"
    )
    return fold.crossJoin(F.broadcast(lang)).select(
        "n_docs",
        "n_tokens",
        "n_unique_docs",
        ppm("n_docs - n_unique_docs", "n_docs").alias("dup_ppm"),
        ppm("_nq", "n_docs").alias("quality_keep_ppm"),
        ppm("_nb", "n_docs").alias("blocklist_keep_ppm"),
        ppm("_ne", "n_docs").alias("encoding_clean_ppm"),
        "n_langs",
        "top_lang",
        ppm("_top_cnt", "n_docs").alias("top_lang_ppm"),
    )


_O_CORPUS_CARD = """
WITH s AS (SELECT
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS n_punct,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      AS n_digit,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
    CAST(length(text)
         - length(regexp_replace(text,
             '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'))
         AS BIGINT)
      + CAST(length(text) - length(replace(text, chr(65533), ''))
         AS BIGINT)
      + CAST((length(text) - length(replace(text, chr(195), '')))
         + (length(text) - length(replace(text, chr(226), '')))
         AS BIGINT) AS n_artifacts,
    lang, md5(text) AS fp
  FROM documents),
r AS (SELECT n_tokens, lang, fp,
    CAST((n_tokens >= 5 AND n_tokens <= 100000
     AND n_nonspace / n_tokens >= 2.0 AND n_nonspace / n_tokens <= 12.0
     AND n_punct / n_chars <= 0.30 AND n_digit / n_chars <= 0.50)
      AS INT) AS q,
    CAST((len(toks) = 0 OR
     CAST(len(list_filter(toks,
       x -> list_contains(['slow','spam','junk','vector'], x)))
       AS BIGINT) * 1000000 < 60001 * CAST(len(toks) AS BIGINT))
      AS INT) AS b,
    CAST(n_artifacts = 0 AS INT) AS e
  FROM s),
f AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_docs,
        CAST(sum(q) AS BIGINT) AS nq,
        CAST(sum(b) AS BIGINT) AS nb,
        CAST(sum(e) AS BIGINT) AS ne
      FROM r),
lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY 1),
lg AS (SELECT CAST(count(*) AS BIGINT) AS n_langs,
         min(struct_pack(neg := -cnt, lang := lang)) AS best
       FROM lc)
SELECT n_docs, n_tokens, n_unique_docs,
  CAST(CAST(n_docs - n_unique_docs AS HUGEINT) * 1000000 // n_docs
       AS BIGINT) AS dup_ppm,
  CAST(CAST(nq AS HUGEINT) * 1000000 // n_docs AS BIGINT)
    AS quality_keep_ppm,
  CAST(CAST(nb AS HUGEINT) * 1000000 // n_docs AS BIGINT)
    AS blocklist_keep_ppm,
  CAST(CAST(ne AS HUGEINT) * 1000000 // n_docs AS BIGINT)
    AS encoding_clean_ppm,
  n_langs,
  best.lang AS top_lang,
  CAST(CAST(-best.neg AS HUGEINT) * 1000000 // n_docs AS BIGINT)
    AS top_lang_ppm
FROM f, lg
"""


# ---------------------------------------------------------------------------
# Session-11 ops: weighted sampling, incremental re-extraction plan,
# screen confusion metrics
# ---------------------------------------------------------------------------


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted without-replacement sample: exactly 100
    documents picked by integer Efraimidis-Spirakis-style priorities
    (u div weight, k smallest), weight = (doc_id % 10 + 1) ppk-style.
    Map-side priority + TakeOrderedAndProject top-k — no global sort."""
    from .operators.sampling import weighted_sample_k

    docs = _sql_over(
        spark,
        sf_dir,
        "SELECT doc_id, (doc_id % 10 + 1) * 1000 AS w_ppm FROM documents",
        "documents",
    )
    return weighted_sample_k(docs, k=100)


_O_WEIGHTED_SAMPLE = """
WITH d AS (SELECT doc_id,
             CAST((doc_id % 10 + 1) * 1000 AS BIGINT) AS weight
           FROM documents),
pr AS (SELECT doc_id, weight,
         CAST(('0x' || substring(
             md5(CAST(doc_id AS VARCHAR) || ':0w'), 1, 15)) AS BIGINT)
           // weight AS p
       FROM d WHERE weight > 0)
SELECT doc_id, weight FROM pr ORDER BY p, doc_id LIMIT 100
"""


def q_reextract_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-extraction workload plan between the documents
    table and the simulated next snapshot (the q_snapshot_diff pair):
    per source, docs to re-extract / skip / tombstone, character volume
    of the re-extraction work, and the exact ppm of the new snapshot
    saved by the lineage anti-join. ONE pinned full-outer sort-merge
    join + bounded source rollup."""
    from .operators.dedup import reextract_plan

    prev = _docs(spark, sf_dir)
    curr = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_SNAPSHOT_B}) b", "documents"
    )
    return reextract_plan(prev, curr)


_O_REEXTRACT_PLAN = f"""
WITH b AS ({_SNAPSHOT_B}),
ha AS (SELECT doc_id, source, md5(text) AS h FROM documents),
hb AS (SELECT doc_id, source, md5(text) AS h,
         CAST(length(text) AS BIGINT) AS len_b
       FROM b),
j AS (SELECT coalesce(hb.source, ha.source) AS source,
        CASE WHEN hb.h IS NULL THEN 'tombstone'
             WHEN ha.h IS NULL OR ha.h <> hb.h THEN 'reextract'
             ELSE 'skip' END AS st,
        coalesce(hb.len_b, 0) AS len_b
      FROM ha FULL OUTER JOIN hb USING (doc_id)),
ps AS (SELECT source,
         CAST(sum(CASE WHEN st = 'reextract' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_reextract,
         CAST(sum(CASE WHEN st = 'skip' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_skip,
         CAST(sum(CASE WHEN st = 'tombstone' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tombstone,
         CAST(sum(CASE WHEN st = 'reextract' THEN len_b ELSE 0 END)
              AS BIGINT) AS work_chars
       FROM j GROUP BY 1)
SELECT source, n_reextract + n_skip AS n_docs, n_reextract, n_skip,
  n_tombstone, work_chars,
  CAST(CAST(n_skip AS HUGEINT) * 1000000 // (n_reextract + n_skip)
       AS BIGINT) AS saved_ppm
FROM ps
"""


def q_screen_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the Gopher-style quality screen against a
    deterministic labeled audit set (label = the document's length band,
    a correlated-but-imperfect proxy): one conditional-sum fold to a
    single row, all metrics exact ppm integers."""
    from .operators.textstats import quality_keep, screen_confusion

    docs = _docs(spark, sf_dir)
    labeled = docs.select(
        quality_keep(F.col("text")).alias("pred"),
        (F.length("text") >= 120).alias("label"),
    )
    return screen_confusion(labeled)


_O_SCREEN_CONFUSION = """
WITH s AS (SELECT
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS n_punct,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      AS n_digit,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
    n_chars >= 120 AS label
  FROM documents),
pl AS (SELECT
    (n_tokens >= 5 AND n_tokens <= 100000
     AND n_nonspace / n_tokens >= 2.0 AND n_nonspace / n_tokens <= 12.0
     AND n_punct / n_chars <= 0.30 AND n_digit / n_chars <= 0.50) AS pred,
    label
  FROM s),
c AS (SELECT
    CAST(sum(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_tp,
    CAST(sum(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_fp,
    CAST(sum(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT)
      AS n_fn,
    CAST(sum(CASE WHEN NOT pred AND NOT label THEN 1 ELSE 0 END)
         AS BIGINT) AS n_tn
  FROM pl)
SELECT n_tp, n_fp, n_fn, n_tn,
  CAST(CAST(n_tp AS HUGEINT) * 1000000 // nullif(n_tp + n_fp, 0)
       AS BIGINT) AS precision_ppm,
  CAST(CAST(n_tp AS HUGEINT) * 1000000 // nullif(n_tp + n_fn, 0)
       AS BIGINT) AS recall_ppm,
  CAST(2 * (CAST(n_tp AS HUGEINT) * 1000000 // nullif(n_tp + n_fp, 0))
         * (CAST(n_tp AS HUGEINT) * 1000000 // nullif(n_tp + n_fn, 0))
       // nullif((CAST(n_tp AS HUGEINT) * 1000000
                  // nullif(n_tp + n_fp, 0))
                 + (CAST(n_tp AS HUGEINT) * 1000000
                    // nullif(n_tp + n_fn, 0)), 0) AS BIGINT) AS f1_ppm
FROM c
"""


# ---------------------------------------------------------------------------
# Session-12 ops: multi-rater Fleiss kappa, mix concentration,
# packing padding waste
# ---------------------------------------------------------------------------


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across the THREE map-only screens the funnel chains
    (Gopher quality, blocklist, encoding health) — all three raters are
    column expressions in ONE scan projection, then a single fold."""
    from .operators.textstats import (
        CTRL_CHAR_RE,
        MOJIBAKE_MARKERS,
        blocklist_keep,
        fleiss_kappa,
        quality_keep,
    )

    docs = _docs(spark, sf_dir)
    text = F.col("text")
    n_chars = F.length(text).cast("long")

    def _cnt(marker: str):
        return (
            n_chars - F.length(F.replace(text, F.lit(marker)))
        ).cast("long")

    n_ctrl = (
        n_chars - F.length(F.regexp_replace(text, CTRL_CHAR_RE, ""))
    ).cast("long")
    clean = (
        _cnt("�")
        + n_ctrl
        + _cnt(MOJIBAKE_MARKERS[0])
        + _cnt(MOJIBAKE_MARKERS[1])
    ) == F.lit(0)
    labeled = docs.select(
        quality_keep(text).alias("keep_a"),
        blocklist_keep(text).alias("keep_b"),
        clean.alias("keep_c"),
    )
    return fleiss_kappa(labeled, ("keep_a", "keep_b", "keep_c"))


_O_FLEISS_KAPPA = """
WITH s AS (SELECT
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS n_punct,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
      AS n_digit,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
    CAST(length(text)
         - length(regexp_replace(text,
             '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'))
         AS BIGINT)
      + CAST(length(text) - length(replace(text, chr(65533), ''))
         AS BIGINT)
      + CAST((length(text) - length(replace(text, chr(195), '')))
         + (length(text) - length(replace(text, chr(226), '')))
         AS BIGINT) AS n_artifacts
  FROM documents),
r AS (SELECT
    (n_tokens >= 5 AND n_tokens <= 100000
     AND n_nonspace / n_tokens >= 2.0 AND n_nonspace / n_tokens <= 12.0
     AND n_punct / n_chars <= 0.30 AND n_digit / n_chars <= 0.50)
      AS keep_a,
    (len(toks) = 0 OR
     CAST(len(list_filter(toks,
       x -> list_contains(['slow','spam','junk','vector'], x)))
       AS BIGINT) * 1000000 < 60001 * CAST(len(toks) AS BIGINT))
      AS keep_b,
    n_artifacts = 0 AS keep_c
  FROM s),
k AS (SELECT (CAST(keep_a AS INT) + CAST(keep_b AS INT)
              + CAST(keep_c AS INT)) AS k FROM r),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(k) AS BIGINT) AS n_keep_votes,
        CAST(sum(k * (k - 1) + (3 - k) * (2 - k)) AS BIGINT) AS s
      FROM k),
p AS (SELECT n_items, n_keep_votes,
        CAST(CAST(s AS HUGEINT) * 1000000
             // (CAST(n_items AS HUGEINT) * 6) AS BIGINT) AS pbar_ppm,
        CAST(CAST(n_keep_votes AS HUGEINT) * 1000000
             // (CAST(n_items AS HUGEINT) * 3) AS BIGINT) AS pk,
        CAST((CAST(n_items AS HUGEINT) * 3 - n_keep_votes) * 1000000
             // (CAST(n_items AS HUGEINT) * 3) AS BIGINT) AS pd
      FROM c),
e AS (SELECT n_items, n_keep_votes, pbar_ppm,
        CAST((pk * pk + pd * pd) // 1000000 AS BIGINT) AS pe_ppm
      FROM p)
SELECT n_items, CAST(3 AS INT) AS n_raters, n_keep_votes, pbar_ppm,
  pe_ppm,
  CAST(CASE WHEN pe_ppm = 1000000 THEN NULL
       WHEN pbar_ppm >= pe_ppm THEN
         (pbar_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
       ELSE
         -((pe_ppm - pbar_ppm) * 1000000 // (1000000 - pe_ppm))
       END AS BIGINT) AS kappa_ppm
FROM e
"""


def q_mix_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted source-concentration audit of the corpus mix:
    exact-ppm HHI, Gini (sorted-rank identity — no pairwise join), and
    top-source share; one bounded groupBy(source), everything after
    runs on the |sources|-row aggregate."""
    from .operators.sampling import mix_concentration

    docs = _docs(spark, sf_dir)
    src = docs.select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return mix_concentration(src, group_col="source",
                             weight_col="n_tokens")


_O_MIX_CONCENTRATION = """
WITH g AS (SELECT source,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
      FROM documents GROUP BY 1),
gp AS (SELECT w FROM g WHERE w > 0),
rk AS (SELECT w, CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS i
       FROM gp),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
          CAST(sum(w) AS BIGINT) AS total_w,
          CAST(max(w) AS BIGINT) AS top1,
          sum(CAST(i AS HUGEINT) * w) AS iw
        FROM rk),
sh AS (SELECT CAST(CAST(w AS HUGEINT) * 1000000 // total_w AS BIGINT)
          AS share_ppm
       FROM rk, tot),
hh AS (SELECT CAST(sum(CAST(share_ppm AS HUGEINT) * share_ppm)
          // 1000000 AS BIGINT) AS hhi_ppm FROM sh)
SELECT n_groups, total_w,
  CAST(CAST(top1 AS HUGEINT) * 1000000 // total_w AS BIGINT)
    AS top1_ppm,
  hhi_ppm,
  CAST((2 * iw - (CAST(n_groups AS HUGEINT) + 1) * total_w) * 1000000
       // (CAST(n_groups AS HUGEINT) * total_w) AS BIGINT) AS gini_ppm
FROM tot, hh
"""


def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard padding/overflow audit of the contiguous packing: pad
    and overflow tokens against n_packs×budget capacity plus exact-ppm
    fill rate; the (shard, pack) rollup reuses the packing window's
    shard partitioning."""
    from .operators.sampling import (
        pack_contiguous,
        padding_waste,
        shard_assign,
    )

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_contiguous(
        shard_assign(with_tokens, n_shards=8, seed=0), budget=_PACK_BUDGET
    )
    return padding_waste(packed, budget=_PACK_BUDGET)


_O_PADDING_WASTE = f"""
WITH pp AS (SELECT shard, pack_id,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tok
      FROM ({_O_SHARD_PACK}) sp GROUP BY 1, 2)
SELECT shard,
  CAST(count(*) AS BIGINT) AS n_packs,
  CAST(sum(n_docs) AS BIGINT) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS used_tokens,
  CAST(count(*) * {_PACK_BUDGET} AS BIGINT) AS capacity,
  CAST(sum(greatest({_PACK_BUDGET} - tok, 0)) AS BIGINT) AS pad_tokens,
  CAST(sum(greatest(tok - {_PACK_BUDGET}, 0)) AS BIGINT)
    AS overflow_tokens,
  CAST(CAST(sum(least(tok, {_PACK_BUDGET})) AS HUGEINT) * 1000000
       // (count(*) * {_PACK_BUDGET}) AS BIGINT) AS fill_ppm
FROM pp GROUP BY 1
"""


#: epoch override for the timestamp lint: the derived corpus's natural
#: epoch (doc_id*60 + anchor) is strictly monotone within every
#: conversation, so both engines perturb it on modular conditions to
#: plant real clock damage — a 25h backward jump (doc_id % 13 = 7 →
#: negative inter-turn gap) and an exact repeat (doc_id % 17 = 5 →
#: zero gap: non-monotonic but not backward)
_TS_EPOCH_SQL = (
    "doc_id * 60 + 1704067200"
    " - CASE WHEN doc_id % 13 = 7 THEN 90000"
    " WHEN doc_id % 17 = 5 THEN 2400 ELSE 0 END"
)


def q_timestamp_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-integrity lint per conversation (ordering violations,
    gap bounds, span) over the derived transcripts with a shared
    clock-damage perturbation so both violation classes occur (see
    :func:`~poc_document_ocr_spark.operators.examples.timestamp_lint`)."""
    from .operators.examples import timestamp_lint

    t = spark_transcripts(spark, sf_dir).withColumn(
        "epoch", F.expr(_TS_EPOCH_SQL)
    )
    return timestamp_lint(t)


_O_TIMESTAMP_LINT = oracle_cte(f"""
, e AS (SELECT conv_id, turn_idx, {_TS_EPOCH_SQL} AS epoch FROM t),
g AS (SELECT conv_id, epoch,
        epoch - lag(epoch) OVER (PARTITION BY conv_id ORDER BY turn_idx)
          AS gap
      FROM e)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(CASE WHEN gap <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nonmonotonic,
  CAST(sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_backward,
  CAST(min(gap) AS BIGINT) AS min_gap_s,
  CAST(max(gap) AS BIGINT) AS max_gap_s,
  CAST(max(epoch) - min(epoch) AS BIGINT) AS span_s
FROM g GROUP BY conv_id
""")


#: artifact-phrase injection for the census: the synthetic corpus has no
#: model boilerplate, so both engines append canned phrases on modular
#: conditions — mixed case (exercises the lower() path), one double
#: occurrence (exercises occurrence counting vs doc counting)
_AI_INJECT_SQL = (
    "text || CASE WHEN doc_id % 7 = 2 THEN"
    " ' As an AI language model, I cannot assist with that.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 11 = 3 THEN"
    " ' Certainly! Here is the answer. Certainly! Here is more.'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 13 = 5 THEN"
    " ' As of my knowledge cutoff it held. Regenerate response'"
    " ELSE '' END"
)


def q_ai_artifact_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned assistant-artifact contamination census over documents
    with a shared phrase injection (see
    :func:`~poc_document_ocr_spark.operators.textstats.ai_artifact_census`)."""
    from .operators.textstats import ai_artifact_census

    docs = _docs(spark, sf_dir).withColumn("text", F.expr(_AI_INJECT_SQL))
    return ai_artifact_census(docs)


def _o_ai_artifact_census() -> str:
    """DuckDB twin generated from the same phrase tuple (single source
    of truth for the phrase list)."""
    from .operators.textstats import AI_ARTIFACT_PHRASES

    phrases = ", ".join(f"'{p}'" for p in AI_ARTIFACT_PHRASES)
    return f"""
WITH a AS (SELECT doc_id, lower({_AI_INJECT_SQL}) AS lt FROM documents),
p AS (SELECT unnest([{phrases}]) AS phrase),
h AS (SELECT p.phrase,
        (length(a.lt) - length(replace(a.lt, p.phrase, '')))
          // length(p.phrase) AS n
      FROM a CROSS JOIN p),
tot AS (SELECT CAST(count(*) AS BIGINT) AS _tot FROM a)
SELECT phrase,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS n_occurrences,
  CAST(CAST(count(*) AS HUGEINT) * 1000000 // greatest(_tot, 1)
    AS BIGINT) AS doc_ppm
FROM h, tot WHERE n > 0 GROUP BY phrase, _tot
"""


def q_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard similarity join (PPJoin shape) at
    t = 0.6 over the seeded near-dup corpus. The oracle is the BRUTE
    FORCE all-pairs join — so a green row proves the prefix filter
    missed nothing, the completeness property LSH can't offer (see
    :func:`~poc_document_ocr_spark.operators.dedup.prefix_similarity_join`)."""
    from .operators.dedup import prefix_similarity_join, word_shingles

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    return prefix_similarity_join(word_shingles(corpus), t_ppm=600_000)


_O_PREFIX_JOIN = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        CAST(za.sz + zb.sz - inter AS BIGINT) AS union_n
      FROM inter
      JOIN sz za ON za.doc_id = id_a
      JOIN sz zb ON zb.doc_id = id_b)
SELECT id_a, id_b, inter, union_n,
  CAST(inter * 1000000 // union_n AS BIGINT) AS jac_ppm
FROM j WHERE inter * 1000000 >= 600000 * union_n
"""


def q_emb_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding variance / dead-dimension / anisotropy
    audit in exact micro-unit² integers (see
    :func:`~poc_document_ocr_spark.operators.similarity.emb_dim_profile`)."""
    from .operators.similarity import emb_dim_profile

    load_views(spark, sf_dir, "embeddings")
    return emb_dim_profile(spark.table("embeddings"))


_O_EMB_DIMS = """
WITH q AS (SELECT i - 1 AS dim,
        CAST(floor((CAST(embedding[i] AS DOUBLE) + 2.0) * 1000000)
          AS BIGINT) AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
s AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_vecs,
        CAST(sum(v) AS BIGINT) AS sv,
        CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS svv
      FROM q GROUP BY dim),
v AS (SELECT dim, n_vecs,
        CAST(sv // n_vecs AS BIGINT) AS mean_q,
        CAST((n_vecs * svv - CAST(sv AS HUGEINT) * sv)
             // (CAST(n_vecs AS HUGEINT) * n_vecs) AS BIGINT) AS var_q2
      FROM s),
tot AS (SELECT CAST(sum(var_q2) AS HUGEINT) AS tot_var FROM v)
SELECT dim, n_vecs, mean_q, var_q2,
  var_q2 < 1000000 AS is_dead,
  CAST(CAST(var_q2 AS HUGEINT) * 1000000 // greatest(tot_var, 1)
    AS BIGINT) AS var_share_ppm
FROM v, tot
"""


def q_source_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding centroid dispersion — semantic monoculture /
    broken-encoder detector at source grain (see
    :func:`~poc_document_ocr_spark.operators.similarity.source_centroids`)."""
    from .operators.similarity import source_centroids

    load_views(spark, sf_dir, "embeddings")
    return source_centroids(spark.table("embeddings"))


_O_SOURCE_CENTROIDS = """
WITH q AS (SELECT label AS source, vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> CAST(floor((x + 2.0) * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings),
e AS (SELECT source, vec_id, i - 1 AS dim, qv[i] AS v
      FROM q, UNNEST(generate_series(1, len(qv))) AS u(i)),
c AS (SELECT source, dim, CAST(sum(v) // count(*) AS BIGINT) AS cdim
      FROM e GROUP BY 1, 2),
d AS (SELECT e.source, e.vec_id,
        CAST(sum((e.v - c.cdim) * (e.v - c.cdim)) AS BIGINT) AS d2
      FROM e JOIN c ON c.source = e.source AND c.dim = e.dim
      GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(CAST(sum(d2) AS HUGEINT) // count(*) AS BIGINT) AS msd_q2,
  CAST(min(d2) AS BIGINT) AS min_d2, CAST(max(d2) AS BIGINT) AS max_d2
FROM d GROUP BY source
"""


def q_source_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source centroid distance matrix — aggregate-similarity
    mirror detection at source grain (see
    :func:`~poc_document_ocr_spark.operators.similarity.source_affinity`)."""
    from .operators.similarity import source_affinity

    load_views(spark, sf_dir, "embeddings")
    return source_affinity(spark.table("embeddings"))


_O_SOURCE_AFFINITY = """
WITH q AS (SELECT label AS source,
    list_transform(CAST(embedding AS DOUBLE[]),
      x -> CAST(floor((x + 2.0) * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings),
e AS (SELECT source, i - 1 AS dim, qv[i] AS v
      FROM q, UNNEST(generate_series(1, len(qv))) AS u(i)),
c AS (SELECT source, dim, CAST(sum(v) // count(*) AS BIGINT) AS cdim
      FROM e GROUP BY 1, 2)
SELECT a.source AS source_a, b.source AS source_b,
  CAST(sum((a.cdim - b.cdim) * (a.cdim - b.cdim)) AS BIGINT) AS d2_q2
FROM c a JOIN c b ON a.dim = b.dim AND a.source < b.source
GROUP BY 1, 2
"""


def q_pack_order_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-first vs arrival-order packing fill comparison over the
    shared shard/budget configuration (see
    :func:`~poc_document_ocr_spark.operators.sampling.pack_order_gain`)."""
    from .operators.sampling import pack_order_gain, shard_assign

    docs = _docs(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return pack_order_gain(
        shard_assign(with_tokens, n_shards=8, seed=0), budget=_PACK_BUDGET
    )


_O_PACK_ORDER_GAIN = f"""
WITH s AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 2) AS h2
  FROM documents),
sh AS (SELECT doc_id, n_tokens,
    CAST((ascii(substr(h2, 1, 1)) * 256 + ascii(substr(h2, 2, 1))) % 8
      AS INT) AS shard
  FROM s),
pa AS (SELECT shard, n_tokens,
    CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
  FROM sh),
ps AS (SELECT shard, n_tokens,
    CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY n_tokens, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
  FROM sh),
wa AS (SELECT shard,
    CAST(sum(least(tok, {_PACK_BUDGET})) AS HUGEINT) * 1000000
      // (count(*) * {_PACK_BUDGET}) AS fill_a,
    CAST(sum(greatest(tok - {_PACK_BUDGET}, 0)) AS BIGINT) AS ov_a
  FROM (SELECT shard, pack_id, sum(n_tokens) AS tok
        FROM pa GROUP BY 1, 2) x GROUP BY shard),
ws AS (SELECT shard,
    CAST(sum(least(tok, {_PACK_BUDGET})) AS HUGEINT) * 1000000
      // (count(*) * {_PACK_BUDGET}) AS fill_s,
    CAST(sum(greatest(tok - {_PACK_BUDGET}, 0)) AS BIGINT) AS ov_s
  FROM (SELECT shard, pack_id, sum(n_tokens) AS tok
        FROM ps GROUP BY 1, 2) x GROUP BY shard)
SELECT wa.shard,
  CAST(fill_a AS BIGINT) AS fill_arrival_ppm,
  CAST(fill_s AS BIGINT) AS fill_sorted_ppm,
  CAST(fill_s - fill_a AS BIGINT) AS gain_ppm,
  ov_a AS overflow_arrival,
  ov_s AS overflow_sorted
FROM wa JOIN ws ON wa.shard = ws.shard
"""


#: shared weight derivation for the ESS report: a 7-level harmonic
#: down-weight (the shape dedup weighting produces — most docs full
#: weight, clusters down-weighted by size)
_ESS_W = "1000000 {div} (1 + doc_id % 7)"


def q_ess_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective-sample-size per source under the shared harmonic
    down-weighting (see
    :func:`~poc_document_ocr_spark.operators.sampling.ess_report`)."""
    from .operators.sampling import ess_report

    docs = _docs(spark, sf_dir).withColumn(
        "w_ppm", F.expr(_ESS_W.format(div="div"))
    )
    return ess_report(docs, group_col="source")


_O_ESS_REPORT = f"""
WITH w AS (SELECT source,
    CAST({_ESS_W.format(div="//")} AS HUGEINT) AS w_ppm
  FROM documents),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    sum(w_ppm) AS sw, sum(w_ppm * w_ppm) AS sww
  FROM w GROUP BY source)
SELECT source, n_docs,
  CAST(sw AS BIGINT) AS sum_w,
  CAST(sw * sw // greatest(sww, 1) AS BIGINT) AS ess_docs,
  CAST((sw * sw // greatest(sww, 1)) * 1000000 // n_docs AS BIGINT)
    AS ess_ppm
FROM s
"""


def q_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/MRR/nDCG@5 of the BM25 ranking against a
    deterministic qrels set (each query's source document plus its two
    same-family successors) — the retrieval-eval harness composed over
    the existing ranked output (see
    :func:`~poc_document_ocr_spark.operators.retrieval.retrieval_metrics`)."""
    from .operators.retrieval import retrieval_metrics

    ranked = q_bm25_topk(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    base = docs.filter(
        (F.col("doc_id") % 37 == 3) & (F.col("doc_id") < 300)
    ).select("doc_id")
    cand = base.select(
        F.col("doc_id").alias("_a"),
        F.explode(
            F.array(F.lit(0), F.lit(37), F.lit(74))
        ).alias("_o"),
    ).select("_a", (F.col("_a") + F.col("_o")).alias("doc_id"))
    qrels = cand.join(base, "doc_id", "semi").select(
        F.concat(F.lit("q"), F.col("_a").cast("string")).alias("query_id"),
        "doc_id",
    )
    return retrieval_metrics(ranked, qrels, k=5)


def _o_retrieval_metrics() -> str:
    """DuckDB twin: brute-force joins over the SAME bm25 oracle ranking
    and the same literal discount table (single Python source)."""
    from .operators.retrieval import ndcg_discount_table

    d = ndcg_discount_table(5)
    prefix, run = [], 0
    for v in d:
        run += v
        prefix.append(run)
    dl = ", ".join(str(v) for v in d)
    pl = ", ".join(str(v) for v in prefix)
    return f"""
WITH r AS ({_O_BM25_TOPK}),
qb AS (SELECT doc_id FROM documents
       WHERE doc_id % 37 = 3 AND doc_id < 300),
qrels AS (SELECT 'q' || CAST(a.doc_id AS VARCHAR) AS query_id,
            a.doc_id + o.o AS doc_id
          FROM qb a, UNNEST([0, 37, 74]) AS o(o)
          WHERE EXISTS (SELECT 1 FROM qb b
                        WHERE b.doc_id = a.doc_id + o.o)),
h AS (SELECT r.query_id, CAST(count(*) AS BIGINT) AS n_hits,
        CAST(min(r.rank) AS BIGINT) AS first_r,
        CAST(sum(list_extract([{dl}], r.rank)) AS BIGINT) AS dcg
      FROM r JOIN qrels q
        ON q.query_id = r.query_id AND q.doc_id = r.doc_id
      GROUP BY 1),
n AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM qrels GROUP BY 1)
SELECT n.query_id, n_rel,
  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
  CAST(coalesce(n_hits, 0) * 1000000 // 5 AS BIGINT) AS prec_ppm,
  CAST(coalesce(n_hits, 0) * 1000000 // greatest(n_rel, 1) AS BIGINT)
    AS recall_ppm,
  CAST(coalesce(1000000 // first_r, 0) AS BIGINT) AS rr_ppm,
  CAST(coalesce(dcg, 0) * 1000000
       // list_extract([{pl}], CAST(least(n_rel, 5) AS INT)) AS BIGINT)
    AS ndcg_ppm
FROM n LEFT JOIN h ON h.query_id = n.query_id
"""


#: shared score/label derivation for the reliability report: a
#: pseudo-uniform ppm score and an outcome drawn Bernoulli(score) by a
#: second independent hash — calibrated BY CONSTRUCTION up to
#: discreteness, so per-bin gaps are small but non-zero and the ECE is
#: a meaningful small integer
_RELIAB_SCORE = "(doc_id * 7919) % 1000001"
_RELIAB_Y = (
    f"CASE WHEN (doc_id * 104729) % 1000000 < {_RELIAB_SCORE}"
    " THEN 1 ELSE 0 END"
)


def q_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE of the shared synthetic score/outcome
    pair (see
    :func:`~poc_document_ocr_spark.operators.textstats.reliability_report`)."""
    from .operators.textstats import reliability_report

    scored = _docs(spark, sf_dir).select(
        F.expr(_RELIAB_SCORE).alias("score_ppm"),
        F.expr(_RELIAB_Y).alias("y"),
    )
    return reliability_report(scored, n_bins=10)


_O_RELIABILITY = f"""
WITH sc AS (SELECT {_RELIAB_SCORE} AS s, {_RELIAB_Y} AS y
            FROM documents),
per AS (SELECT CAST(least(9, s * 10 // 1000000) AS INT) AS bin,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(s) AS BIGINT) AS ss,
          CAST(sum(y) AS BIGINT) AS sy
        FROM sc GROUP BY 1),
g AS (SELECT bin, n,
        CAST(ss // n AS BIGINT) AS mean_score_ppm,
        CAST(sy * 1000000 // n AS BIGINT) AS pos_ppm
      FROM per),
ga AS (SELECT *, abs(mean_score_ppm - pos_ppm) AS gap_ppm FROM g),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
          sum(CAST(n AS HUGEINT) * gap_ppm) AS wg
        FROM ga)
SELECT bin, n, mean_score_ppm, pos_ppm, gap_ppm,
  CAST(wg // tn AS BIGINT) AS ece_ppm
FROM ga, tot
"""


def q_sim_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup operating curve: 100k-ppm similarity buckets with
    from-above cumulative pair counts over the ground-truth pair table
    at t = 0.5 (see
    :func:`~poc_document_ocr_spark.operators.dedup.similarity_curve`)."""
    from .operators.dedup import (
        prefix_similarity_join,
        similarity_curve,
        word_shingles,
    )

    corpus = _sql_over(
        spark, sf_dir, f"SELECT * FROM ({_CORPUS_NEAR}) corpus", "documents"
    )
    return similarity_curve(
        prefix_similarity_join(word_shingles(corpus), t_ppm=500_000)
    )


_O_SIM_CURVE = f"""
WITH corpus AS ({_CORPUS_NEAR}),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
      WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
       FROM w, UNNEST(range(0, len(w) - 2)) AS u(i)),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT CAST(inter AS BIGINT) AS inter,
        CAST(za.sz + zb.sz - inter AS BIGINT) AS union_n
      FROM inter
      JOIN sz za ON za.doc_id = id_a
      JOIN sz zb ON zb.doc_id = id_b),
p AS (SELECT CAST(inter * 1000000 // union_n AS BIGINT) AS jac
      FROM j WHERE inter * 1000000 >= 500000 * union_n),
per AS (SELECT CAST((jac // 100000) * 100000 AS BIGINT)
          AS bucket_lo_ppm,
          CAST(count(*) AS BIGINT) AS n_pairs
        FROM p GROUP BY 1)
SELECT bucket_lo_ppm, n_pairs,
  CAST(sum(n_pairs) OVER (ORDER BY bucket_lo_ppm DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS n_at_or_above
FROM per
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease in exact milli-points per document (see
    :func:`~poc_document_ocr_spark.operators.textstats.readability`)."""
    from .operators.textstats import readability

    return readability(_docs(spark, sf_dir))


_O_READABILITY = """
WITH b AS (SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
    CAST(greatest(1, length(text) - length(translate(text, '.!?', '')))
      AS BIGINT) AS n_sentences,
    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
      AS n_syllables
  FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
  CAST(206835 - (1015 * n_words) // n_sentences
       - (84600 * n_syllables) // greatest(n_words, 1) AS BIGINT)
    AS flesch_milli
FROM b
"""


def q_length_token_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OLS chars→tokens calibration in exact integer
    arithmetic (see
    :func:`~poc_document_ocr_spark.operators.textstats.length_token_fit`)."""
    from .operators.textstats import length_token_fit

    return length_token_fit(_docs(spark, sf_dir), group_col="source")


_O_LENGTH_TOKEN_FIT = """
WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS y FROM documents),
s AS (SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(x * y) AS HUGEINT) AS sxy,
    CAST(sum(x * x) AS HUGEINT) AS sxx,
    CAST(sum(y * y) AS HUGEINT) AS syy
  FROM d GROUP BY source)
SELECT source, n_docs,
  CAST(((n_docs * sxy - sx * sy) * 1000000)
       // greatest(n_docs * sxx - sx * sx, 1) AS BIGINT) AS slope_ppm,
  CAST((((n_docs * sxy - sx * sy) * 1000000)
        // greatest(n_docs * sxx - sx * sx, 1)) * (n_docs * sxy - sx * sy)
       // greatest(n_docs * syy - sy * sy, 1) AS BIGINT) AS r2_ppm
FROM s
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # The driver's correctness gate records the FIRST 50 entries only;
    # more queries exist than slots, so the window is allocated
    # deliberately and everything displaced is verified by the same
    # harness locally (scripts/check_oracles.py ->
    # CORRECTNESS_FULL_r05.json), exactly as the round-3/4 judges
    # re-verified the displaced tail.
    # --- VERDICT r4 task #1: 50 of the 91 never-driver-recorded
    # queries, heaviest machinery first (the judge's named list, then
    # the flagship pipelines / iterative ops / embedding geometry) ---
    "prefix_join": q_prefix_join,
    "bm25_topk": q_bm25_topk,
    "retrieval_metrics": q_retrieval_metrics,
    "edit_verify": q_edit_verify,
    "cms_heavy": q_cms_heavy,
    "hdr_quantiles": q_hdr_quantiles,
    "stats_merge": q_stats_merge,
    "epoch_shuffle": q_epoch_shuffle,
    "chat_render": q_chat_render,
    "maxlen_sweep": q_maxlen_sweep,
    "vocab_coverage": q_vocab_coverage,
    "pack_mixing": q_pack_mixing,
    "turn_merge": q_turn_merge,
    "sys_prompts": q_sys_prompts,
    "source_centroids": q_source_centroids,
    "source_affinity": q_source_affinity,
    "span_lint": q_span_lint,
    "publish_diff": q_publish_diff,
    "temporal_split": q_temporal_split,
    "cross_source_dup": q_cross_source_dup,
    "conv_windows": q_conv_windows,
    "curate_pipeline": q_curate_pipeline,
    "semantic_decontam": q_semantic_decontam,
    "dup_pagerank": q_dup_pagerank,
    "dup_triangles": q_dup_triangles,
    "emb_dims": q_emb_dims,
    "emb_quant": q_emb_quant,
    "hard_negatives": q_hard_negatives,
    "bt_strength": q_bt_strength,
    "reliability": q_reliability,
    "refusal_rate": q_refusal_rate,
    "screen_agreement": q_screen_agreement,
    "length_bias": q_length_bias,
    "sft_examples": q_sft_examples,
    "pref_pairs": q_pref_pairs,
    "best_of_n": q_best_of_n,
    "extractiveness": q_extractiveness,
    "context_fit": q_context_fit,
    "trunc_policy": q_trunc_policy,
    "tool_call_lint": q_tool_call_lint,
    "timestamp_lint": q_timestamp_lint,
    "lock_checkout": q_lock_checkout,
    "streaming_consolidate": q_streaming_consolidate,
    "mix_apply": q_mix_apply,
    "mix_drift": q_mix_drift,
    "source_cap": q_source_cap,
    "ess_report": q_ess_report,
    "data_budget": q_data_budget,
    "epoch_schedule": q_epoch_schedule,
    "compress_ratio": q_compress_ratio,  # hash-green this round (r4 #3)
    # ================= driver 50-entry window ends here =================
    # remaining never-driver-recorded ops (harness-verified in
    # CORRECTNESS_FULL_r05; 41 left after this round's 50-slot rotation)
    "dedup_survivorship": q_dedup_survivorship,
    "lang_switch": q_lang_switch,
    "encoding_screen": q_encoding_screen,
    "novelty_curve": q_novelty_curve,
    "prefix_forks": q_prefix_forks,
    "pmi_pairs": q_pmi_pairs,
    "langid_confusion": q_langid_confusion,
    "boiler_share": q_boiler_share,
    "snapshot_diff": q_snapshot_diff,
    "number_support": q_number_support,
    "conv_neardup": q_conv_neardup,
    "cluster_split": q_cluster_split,
    "containment": q_containment,
    "skew_report": q_skew_report,
    "k_anonymity": q_k_anonymity,
    "curriculum": q_curriculum,
    "dedup_weights": q_dedup_weights,
    "script_mix": q_script_mix,
    "pii_spread": q_pii_spread,
    "dsir_weights": q_dsir_weights,
    "ngram_diversity": q_ngram_diversity,
    "heaps_law": q_heaps_law,
    "tokenizer_fertility": q_tokenizer_fertility,
    "normalize": q_normalize,
    "bpe_merges": q_bpe_merges,
    "turn_transitions": q_turn_transitions,
    "turn_lint": q_turn_lint,
    "turn_latency": q_turn_latency,
    "ngram_novelty": q_ngram_novelty,
    "template_mine": q_template_mine,
    "extract_diff": q_extract_diff,
    "event_funnel": q_event_funnel,
    "rule_overlap": q_rule_overlap,
    "group_sample_k": q_group_sample_k,
    "loop_detect": q_loop_detect,
    "context_taint": q_context_taint,
    "ai_artifacts": q_ai_artifact_census,
    "readability": q_readability,
    "length_token_fit": q_length_token_fit,
    "pack_order_gain": q_pack_order_gain,
    "sim_curve": q_sim_curve,
    # driver-green in round 4 (CORRECTNESS_r04.json)
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_recall": q_ann_recall,
    "kmeans_cells": q_kmeans_cells,
    "bigram_lm": q_bigram_lm,
    "blocklist": q_blocklist,
    "zipf_stats": q_zipf_stats,
    "winnow_fp": q_winnow_fp,
    "winnow_overlap": q_winnow_overlap,
    "rep_stats": q_rep_stats,
    "tfidf_topterms": q_tfidf_topterms,
    "split_sample": q_split_sample,
    "shard_pack": q_shard_pack,
    "pack_manifest": q_pack_manifest,
    "doc_chunks": q_doc_chunks,
    "pii_redact": q_pii_redact,
    "corpus_comp": q_corpus_comp,
    "emb_stats": q_emb_stats,
    "cos_neardup": q_cos_neardup,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "split_leakage": q_split_leakage,
    "curation_funnel": q_curation_funnel,
    "source_profile": q_source_profile,
    "field_coverage": q_field_coverage,
    "strat_sample": q_strat_sample,
    "len_quantiles": q_len_quantiles,
    "length_trim": q_length_trim,
    "bpe_tokens": q_bpe_tokens,
    "semantic_dedup": q_semantic_dedup,
    "cluster_purity": q_cluster_purity,
    "hll_distinct": q_hll_distinct,
    "hll_novelty": q_hll_novelty,
    "bloom_prune": q_bloom_prune,
    "quota_alloc": q_quota_alloc,
    "quality_drift": q_quality_drift,
    "score_calibrate": q_score_calibrate,
    "bitext_mine": q_bitext_mine,
    "consolidate_long": q_consolidate_long,
    "streaming_flush": q_streaming_flush,
    "corpus_card": q_corpus_card,
    "lsh_band_sweep": q_lsh_band_sweep,
    "fleiss_kappa": q_fleiss_kappa,
    "mix_concentration": q_mix_concentration,
    "padding_waste": q_padding_waste,
    "weighted_sample": q_weighted_sample,
    "reextract_plan": q_reextract_plan,
    "screen_confusion": q_screen_confusion,
    "lsh_calibration": q_lsh_calibration,
    # tail: hash-verified by the driver in earlier rounds (window
    # bookkeeping moved them out of the 50-entry front to make room for
    # never-recorded ops)
    "tool_usage": q_tool_usage,
    "conv_shape": q_conv_shape,
    "dedup_exact": q_dedup_exact,
    "minhash_lsh": q_minhash_lsh,
    "minhash_lsh_mid": q_minhash_lsh_mid,
    "dedup_incr": q_dedup_incr,
    "dup_profile": q_dup_profile,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash_neardup": q_simhash_neardup,
    "dedup_components": q_dedup_components,
    "dedup_canon": q_dedup_canon,
    "dup_spans": q_dup_spans,
    "decontam": q_decontam,
    "c4_line_dedup": q_c4_line_dedup,
    "ulm_quality": q_ulm_quality,
    "mix_weights": q_mix_weights,
    "token_stats": q_token_stats,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "quality_score": q_quality_score,
    # driver-green rounds 1-3 and pinned by the pytest suite
    "extract_plain": q_extract_plain,
    "extract_html": q_extract_html,
    "extract_layout": q_extract_layout,
    "extract_md": q_extract_md,
    "dispatch_mix": q_dispatch_mix,
    "field_contributions": q_field_contributions,
    "forward_fill_runs": q_forward_fill_runs,
    "run_headers": q_run_headers,
    "consolidate": q_consolidate,
    "review_projections": q_review_projections,
    "status_projection": q_status_projection,
    "turn_select_reindex": q_turn_select_reindex,
    "dup_skip_anti": q_dup_skip_anti,
    "reassembly": q_reassembly,
    "date_parse": q_date_parse,
    "lineage_counts": q_lineage_counts,
    "event_windows": q_event_windows,
    "event_sessions": q_event_sessions,
    "event_sliding": q_event_sliding,
    "event_trending": q_event_trending,
    "value_hist": q_value_hist,
    "session_size_q": q_session_size_q,
    "asof_ref": q_asof_ref,
    "interval_hits": q_interval_hits,
    "streaming_windows": q_streaming_windows,
    "streaming_sessions": q_streaming_sessions,
    "streaming_dedup": q_streaming_dedup,
    "streaming_totals": q_streaming_totals,
    "streaming_enrich": q_streaming_enrich,
    "streaming_join": q_streaming_join,
}

ORACLES: dict[str, str] = {
    "bm25_topk": _O_BM25_TOPK,
    "prefix_forks": _O_PREFIX_FORKS,
    "screen_agreement": _O_SCREEN_AGREEMENT,
    "length_bias": _O_LENGTH_BIAS,
    "pmi_pairs": _O_PMI_PAIRS,
    "langid_confusion": _O_LANGID_CONFUSION,
    "mix_drift": _O_MIX_DRIFT,
    "boiler_share": _O_BOILER_SHARE,
    "dup_triangles": _O_DUP_TRIANGLES,
    "source_cap": _O_SOURCE_CAP,
    "snapshot_diff": _O_SNAPSHOT_DIFF,
    "number_support": _O_NUMBER_SUPPORT,
    "ngram_diversity": _O_NGRAM_DIVERSITY,
    "heaps_law": _O_HEAPS_LAW,
    "tokenizer_fertility": _o_tokenizer_fertility(),
    "k_anonymity": _O_K_ANONYMITY,
    "curriculum": _O_CURRICULUM,
    "best_of_n": _O_BEST_OF_N,
    "pref_pairs": _O_PREF_PAIRS,
    "hard_negatives": _O_HARD_NEGATIVES,
    "normalize": _O_NORMALIZE,
    "dedup_weights": _O_DEDUP_WEIGHTS,
    "context_fit": _O_CONTEXT_FIT,
    "curate_pipeline": _O_CURATE_PIPELINE,
    "sft_examples": _O_SFT_EXAMPLES,
    "extractiveness": _O_EXTRACTIVENESS,
    "bpe_merges": _O_BPE_MERGES,
    "dsir_weights": _O_DSIR_WEIGHTS,
    "extract_plain": _O_EXTRACT_PLAIN,
    "extract_html": _O_EXTRACT_HTML,
    "extract_layout": _O_EXTRACT_LAYOUT,
    "extract_md": _o_extract_md(),
    "dispatch_mix": _O_DISPATCH_MIX,
    "field_contributions": _O_FIELD_CONTRIBS,
    "forward_fill_runs": _O_FFILL_RUNS,
    "run_headers": _O_RUN_HEADERS,
    "consolidate": _O_CONSOLIDATE,
    "consolidate_long": _O_CONSOLIDATE,
    "streaming_consolidate": _O_CONSOLIDATE,
    "review_projections": _O_REVIEW_PROJECTIONS,
    "lock_checkout": _O_LOCK_CHECKOUT,
    "status_projection": _O_STATUS_PROJECTION,
    "turn_select_reindex": _O_SELECT_REINDEX,
    "dup_skip_anti": _O_DUP_SKIP,
    "reassembly": _O_REASSEMBLY,
    "date_parse": _O_DATE_PARSE,
    "lineage_counts": _O_LINEAGE,
    "event_windows": _O_EVENT_WINDOWS,
    "event_sessions": _O_EVENT_SESSIONS,
    "event_sliding": _O_EVENT_SLIDING,
    "event_trending": _O_EVENT_TRENDING,
    "value_hist": _O_VALUE_HIST,
    "session_size_q": _O_SESSION_SIZE_Q.format(sessions=_O_EVENT_SESSIONS),
    "tool_usage": _O_TOOL_USAGE,
    "conv_shape": _O_CONV_SHAPE,
    "streaming_windows": _O_STREAMING_WINDOWS,
    "streaming_sessions": _O_STREAMING_SESSIONS,
    "streaming_flush": _O_STREAMING_FLUSH,
    "asof_ref": _O_ASOF_REF,
    "interval_hits": _O_INTERVAL_HITS,
    "streaming_dedup": _O_STREAMING_DEDUP,
    "streaming_totals": _O_STREAMING_TOTALS,
    "streaming_enrich": _O_STREAMING_ENRICH,
    "streaming_join": _O_STREAMING_JOIN,
    "dedup_exact": _O_DEDUP_EXACT,
    "minhash_lsh": _O_MINHASH_LSH,
    "minhash_lsh_mid": _O_MINHASH_LSH_MID,
    "dedup_incr": _O_DEDUP_INCR,
    "dup_profile": _O_DUP_PROFILE,
    "ngram_jaccard": _O_NGRAM_JACCARD,
    "simhash_neardup": _O_SIMHASH_NEARDUP,
    "dedup_components": _O_DEDUP_COMPONENTS,
    "dedup_canon": _O_DEDUP_CANON,
    "dup_spans": _O_DUP_SPANS,
    "decontam": _O_DECONTAM,
    "c4_line_dedup": _O_C4_LINE_DEDUP,
    "ulm_quality": _O_ULM_QUALITY,
    "mix_weights": _O_MIX_WEIGHTS,
    "mix_apply": _O_MIX_APPLY,
    "token_stats": _O_TOKEN_STATS,
    "lang_id": _O_LANG_ID,
    "fingerprint": _O_FINGERPRINT,
    "quality_score": _O_QUALITY_SCORE,
    "winnow_fp": _O_WINNOW_FP,
    "winnow_overlap": _O_WINNOW_OVERLAP,
    "rep_stats": _O_REP_STATS,
    "tfidf_topterms": _O_TFIDF_TOPTERMS,
    "split_sample": _o_split_sample(),
    "split_leakage": _o_split_leakage(),
    "curation_funnel": _o_curation_funnel(),
    "source_profile": _O_SOURCE_PROFILE,
    "field_coverage": _o_field_coverage(),
    "strat_sample": _o_strat_sample(),
    "len_quantiles": _O_LEN_QUANTILES,
    "length_trim": _O_LENGTH_TRIM,
    "shard_pack": _O_SHARD_PACK,
    "pack_manifest": _O_PACK_MANIFEST,
    "doc_chunks": _O_DOC_CHUNKS,
    "pii_redact": _O_PII_REDACT,
    "bpe_tokens": _o_bpe_tokens(),
    "corpus_comp": _O_CORPUS_COMP,
    "blocklist": _O_BLOCKLIST,
    "zipf_stats": _O_ZIPF_STATS,
    "bigram_lm": _O_BIGRAM_LM,
    "emb_stats": _O_EMB_STATS,
    "emb_quant": _O_EMB_QUANT,
    "turn_transitions": _O_TURN_TRANSITIONS,
    "turn_lint": _O_TURN_LINT,
    "turn_latency": _O_TURN_LATENCY,
    "ann_topk": _O_ANN_TOPK,
    "ann_lsh": _O_ANN_LSH,
    "ann_recall": _O_ANN_RECALL,
    "ann_ivf": _O_ANN_IVF,
    "kmeans_cells": _O_KMEANS_CELLS,
    "semantic_dedup": _O_SEMANTIC_DEDUP,
    "cos_neardup": _O_COS_NEARDUP,
    "multimodal_meta": _O_MULTIMODAL_META,
    "multimodal_decode": _O_MULTIMODAL_DECODE,
    "bt_strength": _O_BT_STRENGTH,
    "refusal_rate": _O_REFUSAL_RATE,
    "ngram_novelty": _O_NGRAM_NOVELTY,
    "epoch_schedule": _O_EPOCH_SCHEDULE,
    "semantic_decontam": _O_SEMANTIC_DECONTAM,
    "dup_pagerank": _O_DUP_PAGERANK,
    "template_mine": _O_TEMPLATE_MINE,
    "extract_diff": _O_EXTRACT_DIFF,
    "event_funnel": _O_EVENT_FUNNEL,
    "rule_overlap": _O_RULE_OVERLAP,
    "group_sample_k": _O_GROUP_SAMPLE_K,
    "loop_detect": _O_LOOP_DETECT,
    "context_taint": _O_CONTEXT_TAINT,
    "conv_neardup": _O_CONV_NEARDUP,
    "cluster_split": _o_cluster_split(),
    "containment": _O_CONTAINMENT,
    # compress_ratio: built per-sf at oracle_sql() call time (DuckDB has
    # no zlib; the literal table comes from Python zlib over the input
    # texts) — see oracles() below and _o_compress_ratio above
    "source_centroids": _O_SOURCE_CENTROIDS,
    "source_affinity": _O_SOURCE_AFFINITY,
    "skew_report": _O_SKEW_REPORT,
    "cross_source_dup": _O_CROSS_SOURCE_DUP,
    "dedup_survivorship": _O_DEDUP_SURVIVORSHIP,
    "temporal_split": _O_TEMPORAL_SPLIT,
    "lang_switch": _O_LANG_SWITCH,
    "weighted_sample": _O_WEIGHTED_SAMPLE,
    "reextract_plan": _O_REEXTRACT_PLAN,
    "screen_confusion": _O_SCREEN_CONFUSION,
    "corpus_card": _O_CORPUS_CARD,
    "cluster_purity": _O_CLUSTER_PURITY,
    "hll_distinct": _O_HLL_DISTINCT,
    "hll_novelty": _O_HLL_NOVELTY,
    "bloom_prune": _O_BLOOM_PRUNE,
    "quota_alloc": _O_QUOTA_ALLOC,
    "quality_drift": _O_QUALITY_DRIFT,
    "score_calibrate": _O_SCORE_CALIBRATE,
    "bitext_mine": _O_BITEXT_MINE,
    "publish_diff": _O_PUBLISH_DIFF,
    "script_mix": _O_SCRIPT_MIX,
    "span_lint": _O_SPAN_LINT,
    "cms_heavy": _O_CMS_HEAVY,
    "conv_windows": _O_CONV_WINDOWS,
    "hdr_quantiles": _O_HDR_QUANTILES,
    "epoch_shuffle": _O_EPOCH_SHUFFLE,
    "trunc_policy": _O_TRUNC_POLICY,
    "chat_render": _O_CHAT_RENDER,
    "maxlen_sweep": _O_MAXLEN_SWEEP,
    "vocab_coverage": _O_VOCAB_COVERAGE,
    "pack_mixing": _O_PACK_MIXING,
    "data_budget": _O_DATA_BUDGET,
    "pii_spread": _O_PII_SPREAD,
    "tool_call_lint": _O_TOOL_CALL_LINT,
    "stats_merge": _O_STATS_MERGE,
    "edit_verify": _O_EDIT_VERIFY,
    "turn_merge": _O_TURN_MERGE,
    "sys_prompts": _O_SYS_PROMPTS,
    "lsh_band_sweep": _O_LSH_BAND_SWEEP,
    "fleiss_kappa": _O_FLEISS_KAPPA,
    "mix_concentration": _O_MIX_CONCENTRATION,
    "padding_waste": _O_PADDING_WASTE,
    "encoding_screen": _O_ENCODING_SCREEN,
    "novelty_curve": _O_NOVELTY_CURVE,
    "lsh_calibration": _O_LSH_CALIBRATION,
    "timestamp_lint": _O_TIMESTAMP_LINT,
    "ai_artifacts": _o_ai_artifact_census(),
    "readability": _O_READABILITY,
    "length_token_fit": _O_LENGTH_TOKEN_FIT,
    "prefix_join": _O_PREFIX_JOIN,
    "emb_dims": _O_EMB_DIMS,
    "pack_order_gain": _O_PACK_ORDER_GAIN,
    "ess_report": _O_ESS_REPORT,
    "retrieval_metrics": _o_retrieval_metrics(),
    "reliability": _O_RELIABILITY,
    "sim_curve": _O_SIM_CURVE,
}


def oracles() -> dict[str, str]:
    """The full oracle map: the static ORACLES dict plus the per-sf
    construction-literal oracles that must be built at call time
    (compress_ratio — DuckDB has no zlib, so its expected lengths are
    computed driver-side from the input corpus for the sf dir named by
    ``SPARK_GRAFT_ORACLE_SF_DIR``, default the driver's sf0.01 gate)."""
    out = dict(ORACLES)
    out["compress_ratio"] = _o_compress_ratio()
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: consolidated records over sf0.001-derived transcripts."""
    return q_consolidate(spark, "/root/testdata/sf0.001")
