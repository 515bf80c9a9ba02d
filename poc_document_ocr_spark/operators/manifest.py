"""Partition-content manifests: bucket checksums and republish diffs.

The 100 TB publish problem: a curation run re-executes (new extractor
version, new screen thresholds, a resumed job) and MOST of the output is
byte-identical to what is already published. Rewriting everything is a
full-corpus write; diffing row-by-row is a full-corpus join. The manifest
gives an O(buckets) middle path:

* :func:`bucket_manifest` — fold each output partition (a stable hash
  bucket of the id, the same bucketing the blob sink uses) down to
  ``(bucket, n_rows, content_sig)`` where ``content_sig`` is the
  ``bit_xor`` of a per-row 60-bit md5 content key. XOR is commutative,
  associative and self-inverse, so the signature is order-insensitive,
  partial-aggregates map-side (the shuffle carries one row per bucket
  per map task, never corpus rows), and two manifests built on different
  cluster sizes / partition layouts agree bit-for-bit — the same
  invariance the north rule demands of the extraction output itself.
* :func:`manifest_diff` — full-outer join of two manifests on bucket:
  ``changed`` / ``added`` / ``removed`` buckets with row counts. The
  join touches ``O(n_buckets)`` rows regardless of corpus size; only
  the changed buckets need re-publish (or re-verify), which is the
  entire point.

The bucket is keyed on the ID hash alone — NOT the payload — so an
edited document perturbs its bucket's signature in place instead of
migrating between buckets (a payload-keyed bucket would turn every edit
into one "removed" plus one "added" bucket and the diff would saturate).

Engine-portable integer hashing throughout (the repo's md5 idiom):
Spark ``conv(substring(md5(x),1,15),16,10)`` = DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT`` — 60 bits, never negative, so
``bit_xor`` folds agree across engines and ANSI mode never overflows.

Reference parity: the reference's idempotent blob/document sinks
(`DocumentStorageService.cs`) overwrite whole outputs per run; the
manifest is the §2.11-style scale extension that makes the overwrite
incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_manifest", "manifest_diff"]


def bucket_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
    n_buckets: int = 4096,
) -> DataFrame:
    """Fold a publishable table to one ``(bucket, n_rows, content_sig)``
    row per hash bucket of ``id_col``.

    Both aggregates (count, bit_xor) partial-combine map-side, so at any
    corpus size the shuffle is ``O(map_tasks · n_buckets)`` rows of 24
    bytes — the manifest of a 100 TB table is a few MB. Persist it next
    to the output; the next run diffs against it instead of re-reading
    what it published.
    """
    sid = f"CAST({id_col} AS STRING)"
    payload = f"concat_ws('\\u0001', {', '.join(payload_cols)})"
    key = (
        f"CAST(conv(substring(md5(concat_ws('\\u0001', {sid}, {payload}))"
        f", 1, 15), 16, 10) AS BIGINT)"
    )
    bucket = (
        f"pmod(CAST(conv(substring(md5({sid}), 1, 15), 16, 10)"
        f" AS BIGINT), {n_buckets})"
    )
    return (
        df.select(
            F.expr(bucket).alias("bucket"),
            F.expr(key).alias("_key"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(_key)").alias("content_sig"),
        )
    )


def manifest_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-bucket republish plan: full-outer join two manifests on
    bucket and classify. Returns only the buckets needing action —
    ``(bucket, status, n_rows_old, n_rows_new)`` with status in
    ``added`` (bucket only in new), ``removed`` (only in old),
    ``changed`` (both, different signature or count). Unchanged buckets
    — the saved work — are dropped; compute the saved share from
    ``count(diff) / n_buckets``. O(n_buckets) rows on both sides.
    """
    o = old.select(
        "bucket",
        F.col("n_rows").alias("n_rows_old"),
        F.col("content_sig").alias("_sig_old"),
    )
    n = new.select(
        "bucket",
        F.col("n_rows").alias("n_rows_new"),
        F.col("content_sig").alias("_sig_new"),
    )
    j = o.join(n, "bucket", "full_outer")
    status = (
        F.when(F.col("n_rows_old").isNull(), F.lit("added"))
        .when(F.col("n_rows_new").isNull(), F.lit("removed"))
        .when(
            (F.col("_sig_old") != F.col("_sig_new"))
            | (F.col("n_rows_old") != F.col("n_rows_new")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select("bucket", "status", "n_rows_old", "n_rows_new")
    )
