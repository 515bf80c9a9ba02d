"""Forward-fill run aggregation + per-field consolidation folds.

Pure DataFrame/window implementation (no Python UDFs) of the reference's
semantic core:

* ``DocumentAggregatorService.AggregatePagesByIdentifier``
  (``src/DocumentOcr.Processor/Services/DocumentAggregatorService.cs:26-76``)
  — forward-fill + *runs* grouping (gaps-and-islands): an extracted
  identifier different from the carried one starts a NEW group even if it
  appeared earlier; turns without an identifier inherit the carried one
  (provenance ``Inferred``); leading orphans form a synthetic group.
* ``DocumentSchemaMapperService`` (``.../DocumentSchemaMapperService.cs``)
  — the four merge rules (FR-004/005/006/002a) + all-13-keys completion.

Scale notes: both windows share one partitioning/ordering
(``conv_id``/``turn_idx``) → a single sort+shuffle; the fold ``groupBy``
reuses the ``conv_id`` hash partitioning. AQE skew-join/partition splitting
handles long conversations; turn-level extraction upstream never groups.

Determinism traps handled (SURVEY.md §7.4):
* Spark sorts are not stable → confidence ties break by explicit
  ``turn_idx`` in the ordering struct (reference relies on stable
  OrderByDescending; spec pins tie → lowest page, ``spec.md:113``).
* Signature confidence = min over ALL contributors (code behavior, not the
  spec's max-over-signed).
* Concat all-null-confidence → 0.0 (the ``DefaultIfEmpty(0.0)`` quirk at
  ``DocumentSchemaMapperService.cs:238``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..schema import (
    DATE_FIELDS,
    FIELD_NAMES,
    MULTI_VALUE_FIELDS,
    SIGNATURE_FIELDS,
)

__all__ = [
    "with_local_index",
    "with_runs",
    "run_headers",
    "fold_contributions",
    "consolidate",
    "parse_ocr_date",
]

_NEG_INF = float("-inf")


def with_local_index(df: DataFrame) -> DataFrame:
    """Document-local re-index: selected turns renumbered 1..N per conversation.

    Reference parity: FR-011/SC-006 (``PdfProcessorFunction.cs:340``) — after
    range selection, units are renumbered 1..N document-locally.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("local_idx", F.row_number().over(w))


def with_runs(df: DataFrame, id_col: str = "extracted_id") -> DataFrame:
    """Forward-fill + gaps-and-islands run ids over (conv_id, turn_idx).

    Adds columns:

    * ``ffill_id``  — last non-null extracted identifier at-or-before this turn
    * ``run_id``    — 0-based run counter per conversation (0 = leading-orphan
      synthetic group, if any)
    * ``id_source`` — 'Extracted' | 'Inferred' (PageProvenanceEntry invariant)
    """
    ordered = W.partitionBy("conv_id").orderBy("turn_idx")
    cume = ordered.rowsBetween(W.unboundedPreceding, W.currentRow)
    idc = F.col(id_col)
    ffill = F.last(idc, ignorenulls=True).over(cume)
    prev_ffill = F.lag(ffill, 1).over(ordered)
    boundary = F.when(
        idc.isNotNull() & (prev_ffill.isNull() | (idc != prev_ffill)), 1
    ).otherwise(0)
    return (
        df.withColumn("ffill_id", ffill)
        .withColumn("run_id", F.sum(boundary).over(cume).cast("int"))
        .withColumn(
            "id_source",
            F.when(idc.isNotNull(), F.lit("Extracted")).otherwise(
                F.lit("Inferred")
            ),
        )
    )


def run_headers(df: DataFrame, id_col: str = "extracted_id") -> DataFrame:
    """Per-(conv_id, run_id) document header: key, turn stats, provenance.

    ``doc_key`` mirrors the reference's synthetic-identifier rule
    (``DocumentSchemaMapperService.cs:67-71``): empty/whitespace identifier →
    ``unknown-<conv_id>-<firstTurn>``.
    """
    grouped = df.groupBy("conv_id", "run_id").agg(
        F.min("ffill_id").alias("identifier_raw"),
        F.count(F.lit(1)).cast("int").alias("turn_count"),
        F.sort_array(F.collect_list("turn_idx")).alias("turn_idxs"),
        F.min("turn_idx").alias("first_turn"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("turn_idx").alias("turn_idx"),
                    F.col("id_source").alias("source"),
                    F.col(id_col).alias("extracted_id"),
                )
            )
        ).alias("provenance"),
    )
    identifier = F.coalesce(F.col("identifier_raw"), F.lit(""))
    doc_key = F.when(
        F.trim(identifier) != "", identifier
    ).otherwise(
        F.concat(F.lit("unknown-"), F.col("conv_id"), F.lit("-"), F.col("first_turn"))
    )
    return grouped.withColumn("doc_key", doc_key).drop("identifier_raw")


# ---------------------------------------------------------------------------
# Date parsing as JVM-side column expressions (no UDF in the fold path).
# Patterns byte-equivalent to functions/datefold.py (reference
# DateFieldParser.cs:21-29); calendar validation via try_make_date.
# ---------------------------------------------------------------------------

_COMPACT_PAT = (
    r"(?i)^\s*(\d{4})(JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|OCT|NOV|DEC)"
    r"(\d{1,2})\s*$"
)
_LONG_PAT = (
    r"(?i)^\s*(\d{1,2})\s*(?:ST|ND|RD|TH)?\s*DAY\s*OF\s*"
    r"(JANUARY|FEBRUARY|MARCH|APRIL|MAY|JUNE|JULY|AUGUST|SEPTEMBER|"
    r"OCTOBER|NOVEMBER|DECEMBER)\s*,?\s*(\d{4})\s*$"
)

_SHORT_MONTHS = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}
_LONG_MONTHS = {
    "JANUARY": 1, "FEBRUARY": 2, "MARCH": 3, "APRIL": 4, "MAY": 5,
    "JUNE": 6, "JULY": 7, "AUGUST": 8, "SEPTEMBER": 9, "OCTOBER": 10,
    "NOVEMBER": 11, "DECEMBER": 12,
}


def _month_lookup(col: Column, table: dict[str, int]) -> Column:
    expr: Column = F.lit(None).cast("int")
    for name, num in table.items():
        expr = F.when(F.upper(col) == name, F.lit(num)).otherwise(expr)
    return expr


def parse_ocr_date(raw: Column) -> Column:
    """ISO yyyy-MM-dd string or null — column-expression DateFieldParser."""
    cy = F.regexp_extract(raw, _COMPACT_PAT, 1)
    cm = F.regexp_extract(raw, _COMPACT_PAT, 2)
    cd = F.regexp_extract(raw, _COMPACT_PAT, 3)
    ld = F.regexp_extract(raw, _LONG_PAT, 1)
    lm = F.regexp_extract(raw, _LONG_PAT, 2)
    ly = F.regexp_extract(raw, _LONG_PAT, 3)

    def build(y: Column, m: Column, d: Column) -> Column:
        # Calendar validation without try_make_date (absent in this build):
        # make_date(y, m, 1) is always valid for m in 1..12, so
        # day(last_day(...)) gives the month length incl. leap years; invalid
        # days (Feb 30) fall out as null, mirroring DateFieldParser.TryBuild.
        yi, di = y.cast("int"), d.cast("int")
        days_in_month = F.dayofmonth(F.last_day(F.make_date(yi, m, F.lit(1))))
        return F.when(
            m.isNotNull() & (di >= 1) & (di <= days_in_month),
            F.format_string("%04d-%02d-%02d", yi, m, di),
        )

    compact = F.when(
        cy != "", build(cy, _month_lookup(cm, _SHORT_MONTHS), cd)
    )
    longf = F.when(ly != "", build(ly, _month_lookup(lm, _LONG_MONTHS), ld))
    return F.coalesce(compact, longf)


# ---------------------------------------------------------------------------
# Folds
# ---------------------------------------------------------------------------


def fold_contributions(contribs: DataFrame) -> DataFrame:
    """Fold long-format field contributions into per-(doc, field) SchemaFields.

    Input columns: ``conv_id, run_id, field, turn_idx, raw_value, confidence``
    (one row per unit contribution; rows where both raw_value and confidence
    are null must already be dropped — reference ``CollectContributions``
    skip, ``DocumentSchemaMapperService.cs:150-153``).

    Output: one row per (conv_id, run_id, field) with ``value, raw_text,
    confidence, status`` per the four merge rules.
    """
    raw = F.col("raw_value")
    conf = F.col("confidence")
    nonws = raw.isNotNull() & (F.trim(raw) != "")

    # argmax ordering: highest confidence (null → -inf), tie → lowest turn
    order_key = F.struct(
        F.coalesce(conf, F.lit(_NEG_INF)).alias("c"),
        (-F.col("turn_idx")).cast("long").alias("nt"),
    )

    folded = contribs.groupBy("conv_id", "run_id", "field").agg(
        F.max_by(raw, order_key).alias("best_raw"),
        F.max_by(conf, order_key).alias("best_conf"),
        # ordered concat of non-whitespace parts (struct sort is total:
        # turn_idx first — deterministic under any input order)
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            nonws,
                            F.struct(
                                F.col("turn_idx").alias("t"),
                                raw.alias("v"),
                            ),
                        )
                    )
                ),
                lambda x: x["v"],
            ),
            "\n",
        ).alias("concat_raw"),
        F.sum(nonws.cast("int")).alias("n_parts"),
        F.min(F.when(nonws, conf)).alias("concat_conf_min"),
        F.max(
            F.when(F.lower(raw).isin("signed", "present"), True).otherwise(False)
        ).alias("sig_present"),
        F.min(conf).alias("sig_conf_min"),
    )

    fld = F.col("field")
    is_sig = fld.isin(*SIGNATURE_FIELDS)
    is_date = fld.isin(*DATE_FIELDS)
    is_multi = fld.isin(*MULTI_VALUE_FIELDS)

    parsed_date = parse_ocr_date(F.col("best_raw"))

    value = (
        F.when(is_sig, F.when(F.col("sig_present"), "true").otherwise("false"))
        .when(is_date, parsed_date)
        .when(
            is_multi,
            F.when(F.col("n_parts") > 0, F.col("concat_raw")),
        )
        .otherwise(F.col("best_raw"))
    )
    confidence = (
        F.when(is_sig, F.col("sig_conf_min"))
        .when(
            is_multi,
            F.when(
                F.col("n_parts") > 0,
                F.coalesce(F.col("concat_conf_min"), F.lit(0.0)),
            ),
        )
        .otherwise(F.col("best_conf"))
    )
    # raw text preserved only for date fields (SchemaField.OcrRawText contract)
    raw_text = F.when(is_date, F.col("best_raw"))

    return folded.select(
        "conv_id",
        "run_id",
        "field",
        value.alias("value"),
        raw_text.alias("raw_text"),
        confidence.alias("confidence"),
        F.lit("Pending").alias("status"),
    )


def consolidate(
    turns_with_fields: DataFrame,
    contribs: DataFrame,
    id_col: str = "extracted_id",
) -> DataFrame:
    """Headers + folded fields → one wide consolidated record per document.

    All 13 catalog keys always present (contract guarantee 1,
    ``contracts/IDocumentSchemaMapperService.md:40``); absent fields are
    ``(null, null, null, 'Pending')``.

    ``turns_with_fields`` must already carry run columns (``with_runs``);
    ``contribs`` is the long-format contribution table for the same rows.
    """
    headers = run_headers(turns_with_fields, id_col=id_col)
    folded = fold_contributions(contribs)

    # pivot to wide: one struct column per catalog field; pivot over the
    # closed field list avoids a distinct-values job
    field_struct = F.struct("value", "raw_text", "confidence", "status")
    wide = (
        folded.groupBy("conv_id", "run_id")
        .pivot("field", list(FIELD_NAMES))
        .agg(F.first(field_struct))
    )

    default_field = F.struct(
        F.lit(None).cast("string").alias("value"),
        F.lit(None).cast("string").alias("raw_text"),
        F.lit(None).cast("double").alias("confidence"),
        F.lit("Pending").alias("status"),
    )
    out = headers.join(wide, ["conv_id", "run_id"], "left")
    for name in FIELD_NAMES:
        out = out.withColumn(name, F.coalesce(F.col(f"`{name}`"), default_field))
    return out
