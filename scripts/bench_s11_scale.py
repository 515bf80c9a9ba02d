"""Scale points for the round-4 SESSION-11 operators (weighted
without-replacement sampling, incremental re-extraction plan, screen
confusion audit — none had a corpus-scale measurement yet).

Inputs, all deterministic (same harness family as bench_s9_scale.py):

* documents — the extracted texts of the 1.88M-turn bench corpus with
  20 hash-derived crawl sources (reused from bench_s9_scale);
* next snapshot — the corpus with ~10% of ids tombstoned, ~20% content-
  changed (trailing token appended) and ~10% brand-new ids at
  ``doc_id + 10^12`` — the crawl-churn shape reextract_plan sizes.

One timed run per op after a small-slice warm-up; per-window hypervisor
steal share sampled (>2% = soft number). Run after bench.py populated
``.bench_cache``::

    python scripts/bench_s11_scale.py [op ...]            # 1.88M rows
    SPARK_GRAFT_BENCH_SCALE=1 python scripts/bench_s11_scale.py  # 18.8M
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from poc_document_ocr_spark.session import get_spark
from scripts._bench_common import steal_sample as _steal_sample

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: audit-sample size for the weighted pick (driver holds k rows — the
#: TakeOrdered merge cost under test, not a toy k)
_SAMPLE_K = 100_000


def next_snapshot(docs):
    """Planted crawl churn at corpus cardinality: drop ~10% of ids,
    change ~20% (trailing token), keep the rest byte-identical, and add
    ~10% new ids — the q_reextract_plan shape."""
    b = F.pmod(F.xxhash64("doc_id", F.lit("churn")), F.lit(10))
    kept = docs.filter(b >= 1).select(
        "doc_id",
        F.when(b <= 2, F.concat("text", F.lit(" changed")))
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    )
    added = docs.filter(b == 0).select(
        (F.col("doc_id") + F.lit(10**12)).alias("doc_id"),
        F.concat("text", F.lit(" fresh")).alias("text"),
        "source",
    )
    return kept.unionByName(added)


def weighted_sample_job(docs):
    from poc_document_ocr_spark.operators.sampling import weighted_sample_k

    wd = docs.select(
        "doc_id",
        ((F.pmod(F.col("doc_id"), F.lit(10)) + 1) * 1000).alias("w_ppm"),
    )
    return weighted_sample_k(wd, k=_SAMPLE_K)


def reextract_job(docs, snap):
    from poc_document_ocr_spark.operators.dedup import reextract_plan

    return reextract_plan(docs, snap)


def confusion_job(docs):
    from poc_document_ocr_spark.operators.textstats import (
        quality_keep,
        screen_confusion,
    )

    labeled = docs.select(
        quality_keep(F.col("text")).alias("pred"),
        (F.length("text") >= 120).alias("label"),
    )
    return screen_confusion(labeled)


def fleiss_job(docs):
    """The q_fleiss_kappa shape: three map-only raters in one scan
    projection, single fold."""
    from poc_document_ocr_spark.operators.textstats import (
        CTRL_CHAR_RE,
        MOJIBAKE_MARKERS,
        blocklist_keep,
        fleiss_kappa,
        quality_keep,
    )

    text = F.col("text")
    n_chars = F.length(text).cast("long")

    def _cnt(marker):
        return (n_chars - F.length(F.replace(text, F.lit(marker)))).cast(
            "long"
        )

    n_ctrl = (
        n_chars - F.length(F.regexp_replace(text, CTRL_CHAR_RE, ""))
    ).cast("long")
    clean = (
        _cnt("�") + n_ctrl
        + _cnt(MOJIBAKE_MARKERS[0]) + _cnt(MOJIBAKE_MARKERS[1])
    ) == F.lit(0)
    labeled = docs.select(
        quality_keep(text).alias("keep_a"),
        blocklist_keep(text).alias("keep_b"),
        clean.alias("keep_c"),
    )
    return fleiss_kappa(labeled, ("keep_a", "keep_b", "keep_c"))


def mix_conc_job(docs):
    from poc_document_ocr_spark.operators.sampling import mix_concentration

    src = docs.select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return mix_concentration(src, group_col="source",
                             weight_col="n_tokens")


def padding_job(docs):
    from poc_document_ocr_spark.operators.sampling import (
        pack_contiguous,
        padding_waste,
        shard_assign,
    )

    with_tokens = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_contiguous(
        shard_assign(with_tokens, n_shards=64, seed=0), budget=1000
    )
    return padding_waste(packed, budget=1000)


def band_sweep_job(docs):
    """The q_lsh_band_sweep shape on a deterministic 10% sample — the
    production convention (the sweep tunes parameters BEFORE the full
    pass; lsh_calibration's full-corpus point covers the worst case)."""
    from poc_document_ocr_spark.operators.dedup import (
        lsh_band_sweep,
        minhash_signatures,
        word_shingles,
    )

    sample = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    sigs = minhash_signatures(word_shingles(sample), num_hashes=16)
    return lsh_band_sweep(sigs, num_hashes=16,
                          rows_per_band_configs=(2, 4, 8))


def corpus_card_job(docs):
    """The q_corpus_card composition at corpus cardinality: one lazily
    checkpointed per-doc screen projection -> global fold (two-phase
    count-distinct) + bounded lang rollup."""
    from pyspark.sql import functions as FF
    import poc_document_ocr_spark.entrypoints as ep

    class _FakeSpark:
        pass

    # re-create the q_corpus_card body over the bench corpus (the query
    # itself loads testdata views; the shape is identical)
    from poc_document_ocr_spark.operators.textstats import (
        CTRL_CHAR_RE, MOJIBAKE_MARKERS, blocklist_keep, quality_keep,
    )
    text = FF.col("text")
    n_chars = FF.length(text).cast("long")
    cnt = lambda m: (n_chars - FF.length(FF.replace(text, FF.lit(m)))).cast("long")
    n_ctrl = (n_chars - FF.length(FF.regexp_replace(text, CTRL_CHAR_RE, ""))).cast("long")
    clean = (cnt("\ufffd") + n_ctrl + cnt(MOJIBAKE_MARKERS[0]) + cnt(MOJIBAKE_MARKERS[1])) == FF.lit(0)
    per_doc = docs.select(
        FF.size(FF.split(text, " ")).cast("long").alias("n_tokens"),
        quality_keep(text).cast("int").alias("q"),
        blocklist_keep(text).cast("int").alias("b"),
        clean.cast("int").alias("e"),
        FF.concat(FF.lit("lang"), FF.pmod(FF.xxhash64("doc_id"), FF.lit(5))).alias("lang"),
        FF.md5(text).alias("fp"),
    ).localCheckpoint(eager=False)
    fold = per_doc.agg(
        FF.count(FF.lit(1)).cast("long").alias("n_docs"),
        FF.sum("n_tokens").cast("long").alias("n_tokens"),
        FF.countDistinct("fp").cast("long").alias("n_unique_docs"),
        FF.sum("q").cast("long").alias("_nq"),
        FF.sum("b").cast("long").alias("_nb"),
        FF.sum("e").cast("long").alias("_ne"),
    )
    lang = (per_doc.groupBy("lang").agg(FF.count(FF.lit(1)).cast("long").alias("_cnt"))
        .agg(FF.count(FF.lit(1)).cast("long").alias("n_langs"),
             FF.min(FF.struct((-FF.col("_cnt")).alias("neg"), FF.col("lang"))).alias("_best"))
        .select("n_langs", FF.col("_best.lang").alias("top_lang"),
                (-FF.col("_best.neg")).cast("long").alias("_top_cnt")))
    return fold.crossJoin(FF.broadcast(lang)).select(
        "n_docs", "n_tokens", "n_unique_docs", "_nq", "_nb", "_ne",
        "n_langs", "top_lang", "_top_cnt")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "0.1")
    only = set(sys.argv[1:])
    spark = get_spark(
        "bench_s11_scale", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )

    extracted = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", f"extracted_{scale}.parquet")
    )
    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("doc_id"), F.lit(20))
        ).alias("source"),
    )
    snap = next_snapshot(docs)

    def consume(df):
        cols = [F.col(c) for c in df.columns]
        return df.select(F.xxhash64(*cols).alias("_h")).agg(
            F.expr("bit_xor(_h)")
        ).collect()

    jobs = {
        "weighted_sample": lambda: consume(weighted_sample_job(docs)),
        "reextract_plan": lambda: consume(reextract_job(docs, snap)),
        "screen_confusion": lambda: consume(confusion_job(docs)),
        "fleiss_kappa": lambda: consume(fleiss_job(docs)),
        "mix_concentration": lambda: consume(mix_conc_job(docs)),
        "padding_waste": lambda: consume(padding_job(docs)),
        "lsh_band_sweep": lambda: consume(band_sweep_job(docs)),
        "corpus_card": lambda: consume(corpus_card_job(docs)),
    }
    unknown = only - set(jobs)
    if unknown:
        raise SystemExit(f"unknown op name(s): {sorted(unknown)}; "
                         f"choose from {sorted(jobs)}")
    selected = {n: f for n, f in jobs.items() if not only or n in only}

    small_d = docs.limit(5000).localCheckpoint()
    small_s = next_snapshot(small_d).localCheckpoint()
    warmups = {
        "weighted_sample": lambda: consume(weighted_sample_job(small_d)),
        "reextract_plan": lambda: consume(reextract_job(small_d, small_s)),
        "screen_confusion": lambda: consume(confusion_job(small_d)),
        "fleiss_kappa": lambda: consume(fleiss_job(small_d)),
        "mix_concentration": lambda: consume(mix_conc_job(small_d)),
        "padding_waste": lambda: consume(padding_job(small_d)),
        "lsh_band_sweep": lambda: consume(band_sweep_job(small_d)),
        "corpus_card": lambda: consume(corpus_card_job(small_d)),
    }
    for name in selected:
        warmups[name]()

    timings, steal = {}, {}
    for name, fn in selected.items():
        spark.catalog.clearCache()
        s0, j0 = _steal_sample()
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 2)
        s1, j1 = _steal_sample()
        steal[name] = round((s1 - s0) / max(j1 - j0, 1), 4)

    print(json.dumps({"scale": scale, "timings": timings, "steal": steal}))


if __name__ == "__main__":
    main()
