"""Physical-plan audit: verify the plans are the plans we designed.

For each audited query this prints the properties that matter at 100 TB —
shuffle (Exchange) count, scan column pruning (ReadSchema), partition/
pushed filters, join strategies, whole-stage-codegen coverage — asserts
the expected shape, and writes a human-readable PLANS.md. Run after plan-
affecting changes::

    python scripts/audit_plans.py [sf_dir]

Exits non-zero if any asserted property fails.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from poc_document_ocr_spark import entrypoints as ep
from poc_document_ocr_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit(spark, sf_dir: str):
    checks = []  # (name, ok, detail)
    sections = []

    def check(name: str, ok: bool, detail: str):
        checks.append((name, ok, detail))

    def excerpt(plan: str, n: int = 14) -> str:
        lines = [l for l in plan.splitlines() if l.strip()][:n]
        return "\n".join(lines)

    # --- consolidate: ONE Exchange end-to-end ----------------------------
    # the run windows sort within hash(conv_id) partitions, and the fold
    # groupBy(conv_id, run_id) REUSES that partitioning (a partitioning on
    # a subset of the grouping keys satisfies ClusteredDistribution), so
    # the entire extract→windows→fold pipeline shuffles the data once
    rec = ep.QUERIES["consolidate"](spark, sf_dir)
    p = plan_of(rec)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "consolidate: ONE shuffle end-to-end (fold reuses window partitioning)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )
    sections.append(("consolidate", excerpt(p)))

    # --- extraction scan: column pruning to the UDF inputs ----------------
    ex = ep.QUERIES["extract_plain"](spark, sf_dir)
    p = plan_of(ex)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = sorted(c.split(":")[0] for c in m.group(1).split(",")) if m else []
    check(
        "extract: scan pruned to the needed columns",
        bool(m) and "text" in cols and len(cols) <= 3,
        f"ReadSchema columns = {cols}",
    )

    # --- token_stats: map-only, no Exchange, one pruned scan -------------
    ts = ep.QUERIES["token_stats"](spark, sf_dir)
    p = plan_of(ts)
    check(
        "token_stats: map-only (zero shuffles)",
        "Exchange" not in p,
        "no Exchange in plan",
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    check(
        "token_stats: scan reads only (doc_id, text)",
        bool(m) and sorted(
            c.split(":")[0] for c in m.group(1).split(",")
        ) == ["doc_id", "text"],
        m.group(1) if m else "no ReadSchema",
    )

    # --- duplicate-skip anti-join: strategy left to AQE ------------------
    # (round-3 finding: the demo query force-broadcast `existing`, which is
    # corpus-derived — 20% of all conv_ids — and grows with the input. The
    # production path leaves the strategy to AQE; the demo must mirror it.)
    anti = ep.QUERIES["dup_skip_anti"](spark, sf_dir)
    p = plan_of(anti)
    check(
        "dup_skip_anti: LeftAnti join present, no forced broadcast of the"
        " corpus-derived existing side",
        bool(re.search(r"Join LeftAnti|LeftAnti", p))
        and "ResolvedHint"
        not in anti._jdf.queryExecution().analyzed().toString(),
        "join strategy line: "
        + next((l.strip() for l in p.splitlines() if "Join" in l), "?"),
    )

    # --- no FORCED broadcast of unbounded-cardinality sides ---------------
    # (round-2 finding: explicit F.broadcast of the existing-output-keys set
    # and of ngram_jaccard's per-doc sizes table OOMs at 10^9 docs; both now
    # rely on AQE's runtime choice. A ResolvedHint in the analyzed plan =
    # someone forced it again.)
    def analyzed(df) -> str:
        return df._jdf.queryExecution().analyzed().toString()

    nj = ep.QUERIES["ngram_jaccard"](spark, sf_dir)
    check(
        "ngram_jaccard: no forced broadcast (per-doc sizes side is unbounded)",
        "ResolvedHint" not in analyzed(nj),
        "no ResolvedHint in analyzed plan",
    )
    from poc_document_ocr_spark.plans.pipeline import dedup_against_existing

    recs = spark.createDataFrame(
        [("c1", 0, "k1")], "conv_id string, run_id int, doc_key string"
    )
    ex_keys = spark.createDataFrame([("k2",)], "doc_key string")
    dd = dedup_against_existing(recs, ex_keys)
    check(
        "pipeline dup-skip: no forced broadcast of existing output keys",
        "ResolvedHint" not in analyzed(dd),
        "no ResolvedHint in analyzed plan",
    )
    check(
        "pipeline dup-skip: column order preserved across the anti-join",
        dd.columns == recs.columns,
        f"columns = {dd.columns}",
    )

    # --- ann_lsh: equi bucket join, no cartesian/BNLJ anywhere ------------
    ann = ep.QUERIES["ann_lsh"](spark, sf_dir)
    p = plan_of(ann)
    check(
        "ann_lsh: no CartesianProduct / nested-loop over the corpus",
        "CartesianProduct" not in p,
        "join lines: "
        + "; ".join(
            l.strip()[:70] for l in p.splitlines() if "Join" in l
        )[:200],
    )
    sections.append(("ann_lsh", excerpt(p)))

    # --- bucket-pruned pipeline scan --------------------------------------
    from poc_document_ocr_spark.sources.catalog import Catalog

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cat = Catalog(spark, td)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.concat(F.lit("c"), F.col("doc_id")).alias("conv_id"),
            F.lit(1).alias("turn_idx"),
            F.col("text"),
        )
        cat.write_bucketed(docs, "t", buckets=4)
        one = cat.read("t").filter(F.col("bucket") == 2)
        p = plan_of(one)
        check(
            "bucketed input: wave filter is a PartitionFilter (file pruning)",
            "PartitionFilters: [" in p and "bucket" in
            p.split("PartitionFilters: [", 1)[1][:120],
            p.split("PartitionFilters: [", 1)[1][:80]
            if "PartitionFilters: [" in p else "absent",
        )

    # --- ann_ivf: equi join on centroid cell, never all-pairs -------------
    ivf = ep.QUERIES["ann_ivf"](spark, sf_dir)
    p = plan_of(ivf)
    check(
        "ann_ivf: no CartesianProduct (cell-equi join only)",
        "CartesianProduct" not in p,
        "join lines: "
        + "; ".join(
            l.strip()[:70] for l in p.splitlines() if "Join" in l
        )[:200],
    )

    # --- tfidf: unbounded term-dim join left to AQE; top-k pruned map-side
    tfidf = ep.QUERIES["tfidf_topterms"](spark, sf_dir)
    check(
        "tfidf_topterms: no forced broadcast (vocabulary side is unbounded)",
        "ResolvedHint" not in analyzed(tfidf),
        "no ResolvedHint in analyzed plan",
    )
    p = plan_of(tfidf)
    check(
        "tfidf_topterms: WindowGroupLimit prunes per-doc top-k before shuffle",
        "WindowGroupLimit" in p,
        next(
            (l.strip()[:90] for l in p.splitlines() if "WindowGroupLimit" in l),
            "absent",
        ),
    )

    # --- corpus carving: split/sample/chunk/redact are map-only ----------
    for qname in (
        "split_sample", "strat_sample", "doc_chunks", "pii_redact",
        "rep_stats", "bpe_tokens",
    ):
        q = ep.QUERIES[qname](spark, sf_dir)
        p = plan_of(q)
        check(
            f"{qname}: map-only (zero shuffles)",
            "Exchange" not in p,
            "no Exchange in plan",
        )

    # --- shard_pack: both windows reuse ONE shuffle on the shard key ------
    # (the pack_pos window clusters on (shard, pack_id); hash(shard) already
    # satisfies that ClusteredDistribution, so no second Exchange)
    sp_q = ep.QUERIES["shard_pack"](spark, sf_dir)
    p = plan_of(sp_q)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "shard_pack: ONE shuffle (pack window partitioning reused by pos window)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )
    sections.append(("shard_pack", excerpt(p)))

    # --- c4_line_dedup: skew-safe keeper election ------------------------
    # the segment-hash groupBy must partial-aggregate map-side (a segment
    # repeated 10^9 times = one combiner row per input partition, never a
    # single-task window), and neither join side may be force-broadcast
    # (both are corpus-cardinality)
    c4 = ep.QUERIES["c4_line_dedup"](spark, sf_dir)
    check(
        "c4_line_dedup: no forced broadcast (keeper side is corpus-sized)",
        "ResolvedHint" not in analyzed(c4),
        "no ResolvedHint in analyzed plan",
    )
    p = plan_of(c4)
    check(
        "c4_line_dedup: keeper election partial-aggregates map-side",
        "partial_min" in p,
        next(
            (l.strip()[:90] for l in p.splitlines() if "partial_min" in l),
            "absent",
        ),
    )
    check(
        "c4_line_dedup: no CartesianProduct (hash equi-join back only)",
        "CartesianProduct" not in p,
        "no cartesian in plan",
    )

    # --- ulm_quality: per-language model join left to AQE ----------------
    ulm = ep.QUERIES["ulm_quality"](spark, sf_dir)
    check(
        "ulm_quality: no forced broadcast (unigram model side is unbounded)",
        "ResolvedHint" not in analyzed(ulm),
        "no ResolvedHint in analyzed plan",
    )

    # --- mix_weights: one scan pruned to (lang, text) ---------------------
    mw = ep.QUERIES["mix_weights"](spark, sf_dir)
    p = plan_of(mw)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    check(
        "mix_weights: scan reads only (lang, text)",
        bool(m) and sorted(
            c.split(":")[0] for c in m.group(1).split(",")
        ) == ["lang", "text"],
        m.group(1) if m else "no ReadSchema",
    )

    # --- asof_ref: sort-merge forward-fill shape, never a nested loop -----
    asof = ep.QUERIES["asof_ref"](spark, sf_dir)
    p = plan_of(asof)
    check(
        "asof_ref: no CartesianProduct / BroadcastNestedLoop (union+window asof)",
        "CartesianProduct" not in p and "BroadcastNestedLoop" not in p,
        "no nested-loop join node in plan",
    )

    # --- interval_hits: bucketed equi join, range check residual ----------
    ih = ep.QUERIES["interval_hits"](spark, sf_dir)
    p = plan_of(ih)
    check(
        "interval_hits: equi join on (key, bucket), no nested loop",
        "CartesianProduct" not in p and "BroadcastNestedLoop" not in p,
        "join lines: "
        + "; ".join(
            l.strip()[:70] for l in p.splitlines() if "Join" in l
        )[:200],
    )

    # --- blocklist: map-only lexical screen -------------------------------
    bl = ep.QUERIES["blocklist"](spark, sf_dir)
    p = plan_of(bl)
    check(
        "blocklist: map-only (zero shuffles)",
        "Exchange" not in p,
        "no Exchange in plan",
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    check(
        "blocklist: scan reads only (doc_id, text)",
        bool(m) and sorted(
            c.split(":")[0] for c in m.group(1).split(",")
        ) == ["doc_id", "text"],
        m.group(1) if m else "no ReadSchema",
    )

    # --- zipf_stats: exactly the two designed shuffles --------------------
    # groupBy((lang, term)) then groupBy(lang); the top term is an
    # order-insensitive struct-min aggregate, so NO window (a window here
    # would be a third exchange + per-language sort)
    zp = ep.QUERIES["zipf_stats"](spark, sf_dir)
    p = plan_of(zp)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "zipf_stats: two shuffles (term count + per-lang fold), no window",
        n_ex == 2 and "Window" not in p,
        f"Exchange nodes = {n_ex}, Window = {'Window' in p}",
    )

    # --- bigram_lm: BOUNDED model broadcast, occurrences never shuffled
    # on the bigram key (the model is a pruned artifact à la CCNet's
    # shipped KenLM binary — broadcast is the design, unlike the banned
    # corpus-cardinality broadcasts; measured: SMJ here = 643s at 18.8M
    # docs because AQE can only demote the join after the 340M-row
    # occurrence shuffle is written)
    bg = ep.QUERIES["bigram_lm"](spark, sf_dir)
    p = plan_of(bg)
    check(
        "bigram_lm: model broadcast-joined to the occurrence stream (no"
        " occurrence shuffle on the bigram key)",
        bool(re.search(r"BroadcastHashJoin \[lang", p))
        and "SortMergeJoin" not in p,
        next(
            (l.strip()[:90] for l in p.splitlines() if "Join" in l),
            "absent",
        ),
    )
    check(
        "bigram_lm: bigram formation is map-side (no cartesian; model"
        " partial-aggregates before its exchange)",
        "CartesianProduct" not in p
        and "partial_count" in p,
        "model partial-aggregates map-side; no cartesian",
    )

    # --- dedup_canon: winner election via aggregate, plain joins ----------
    dc = ep.QUERIES["dedup_canon"](spark, sf_dir)
    p = plan_of(dc)
    check(
        "dedup_canon: no CartesianProduct (cluster join is equi on component)",
        "CartesianProduct" not in p,
        "no cartesian in plan",
    )
    check(
        "dedup_canon: keep-best winner partial-aggregates map-side",
        "partial_min" in p,
        next(
            (l.strip()[:90] for l in p.splitlines() if "partial_min" in l),
            "absent",
        ),
    )

    # --- kmeans_cells: final assignment map-only against literal centroids
    # (each Lloyd iteration is one groupBy shuffle of k·dim longs, folded
    # into literals driver-side; the RETURNED assignment plan must be pure
    # scan+project — zero Exchange, zero joins)
    km = ep.QUERIES["kmeans_cells"](spark, sf_dir)
    p = plan_of(km)
    check(
        "kmeans_cells: assignment map-only (centroids are plan literals)",
        "Exchange" not in p and "Join" not in p,
        "no Exchange/Join in returned-assignment plan",
    )

    # --- semantic_dedup: pair generation is CELL-equi only ----------------
    # (the SemDeDup contract: cosine pairs are generated strictly within
    # k-means cells — a cartesian/nested-loop anywhere in the composed plan
    # means the cell partitioning leaked and the op degenerated to global
    # all-pairs, the exact shape the operator exists to avoid)
    sd = ep.QUERIES["semantic_dedup"](spark, sf_dir)
    p = plan_of(sd)
    check(
        "semantic_dedup: cosine pairs cell-equi only (no cartesian/BNLJ in"
        " the composed plan)",
        "CartesianProduct" not in p and "BroadcastNestedLoop" not in p,
        "join lines: "
        + "; ".join(
            l.strip()[:70] for l in p.splitlines() if "Join" in l
        )[:200],
    )

    # --- semantic_dedup pair stage: auto impl routes hot cells ------------
    # (VERDICT r4 "what's wrong" #1, now enforced at runtime: cells above
    # matmul_max_cell take the AQE-splittable cell-equi join, the rest take
    # the matmul fold, and the two branches UNION inside one plan — with a
    # forced tiny threshold both branches must be visible, and the big-cell
    # branch must be a real join, never cartesian)
    from poc_document_ocr_spark.operators.similarity import (
        _cell_similar_pairs,
    )

    lab = (
        spark.range(64)
        .selectExpr(
            "id AS vec_id",
            "CAST(id % 2 AS INT) AS cell",
            "array(CAST(1.0 AS DOUBLE), CAST(id AS DOUBLE) / 100,"
            " CAST(-0.5 AS DOUBLE)) AS embedding",
        )
    )
    ap = plan_of(
        _cell_similar_pairs(lab, 900, impl="auto", matmul_max_cell=8)
    )
    check(
        "semantic_dedup pair stage: auto impl unions matmul fold +"
        " AQE-splittable join branch (hot-cell routing enforced)",
        "FlatMapGroupsInPandas" in ap
        and "Union" in ap
        and "Join" in ap
        and "CartesianProduct" not in ap
        and "BroadcastNestedLoop" not in ap,
        "branches present: fold="
        + str("FlatMapGroupsInPandas" in ap)
        + " union=" + str("Union" in ap)
        + " join=" + str("Join" in ap),
    )

    # --- winnow_overlap: corpus×corpus joins pinned to sort-merge ----------
    # (measured at 1.88M docs: Spark's estimate of the rare-fp aggregate
    # slipped under the broadcast threshold and the runtime broadcast blew
    # past driver.maxResultSize — the fp table and the rare-fp list are
    # BOTH corpus-cardinality, so no broadcast can ever be right here)
    wo = ep.QUERIES["winnow_overlap"](spark, sf_dir)
    p = plan_of(wo)
    check(
        "winnow_overlap: fp joins are sort-merge (no broadcast of a"
        " corpus-cardinality side, no cartesian)",
        "BroadcastHashJoin" not in p and "CartesianProduct" not in p,
        "join lines: "
        + "; ".join(
            l.strip()[:70] for l in p.splitlines() if "Join" in l
        )[:200],
    )

    # --- split_leakage: leak election partial-aggregates map-side ---------
    sl = ep.QUERIES["split_leakage"](spark, sf_dir)
    p = plan_of(sl)
    check(
        "split_leakage: fingerprint groupBy partial-aggregates map-side",
        "partial_count" in p and "CartesianProduct" not in p,
        "collect_set fold partial-aggregates; no cartesian",
    )

    # --- curation_funnel: dedup total + split finals in ONE rollup pass ---
    cf = ep.QUERIES["curation_funnel"](spark, sf_dir)
    p = plan_of(cf)
    n_expand = len(re.findall(r"\bExpand\b", p))
    check(
        "curation_funnel: keeper rollup is one Expand pass (no second scan"
        " of the keeper set)",
        n_expand == 1 and "CartesianProduct" not in p,
        f"Expand nodes = {n_expand}",
    )
    # round-3 finding: both union branches consumed `flags` unpersisted, so
    # the corpus text was scanned twice. The flags projection is now
    # localCheckpointed — the funnel's own plan must contain NO parquet
    # scan of the documents text (both branches read the checkpoint).
    n_scans = len(re.findall(r"Scan parquet|FileScan parquet", p))
    check(
        "curation_funnel: corpus scanned once (flags checkpointed; no "
        "parquet scan inside the funnel plan)",
        n_scans == 0,
        f"parquet scans in funnel plan = {n_scans}",
    )

    # --- extract_md: Arrow-batched, zero shuffles, pruned scan -------------
    md = ep.QUERIES["extract_md"](spark, sf_dir)
    p = plan_of(md)
    check(
        "extract_md: map-only (the md engine runs inside the Arrow batch)",
        "Exchange" not in p and "ArrowEvalPython" in p,
        "no Exchange; ArrowEvalPython stage present",
    )

    # --- event analytics: shuffle counts and top-k pruning -----------------
    sl = ep.QUERIES["event_sliding"](spark, sf_dir)
    p = plan_of(sl)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "event_sliding: ONE shuffle (window replication is map-side Expand)",
        n_ex == 1 and "Expand" in p,
        f"Exchange nodes = {n_ex}; Expand present",
    )
    tr = ep.QUERIES["event_trending"](spark, sf_dir)
    p = plan_of(tr)
    check(
        "event_trending: rank runs over the aggregate with WindowGroupLimit",
        "WindowGroupLimit" in p,
        next(
            (l.strip()[:90] for l in p.splitlines() if "WindowGroupLimit" in l),
            "absent",
        ),
    )
    vh = ep.QUERIES["value_hist"](spark, sf_dir)
    p = plan_of(vh)
    check(
        "value_hist: bin groupBy partial-aggregates; totals broadcast",
        "partial_count" in p
        and ("BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p),
        "map-side combine + broadcast total",
    )

    # --- dedup_incr: cross-batch equi join only ---------------------------
    di = ep.QUERIES["dedup_incr"](spark, sf_dir)
    p = plan_of(di)
    check(
        "dedup_incr: band equi-join between batches, no cartesian",
        "CartesianProduct" not in p,
        "no cartesian in plan",
    )

    # --- length_trim: bounded bounds table broadcast back ------------------
    lt = ep.QUERIES["length_trim"](spark, sf_dir)
    p = plan_of(lt)
    check(
        "length_trim: per-language bounds broadcast onto the corpus",
        bool(re.search(r"BroadcastHashJoin \[lang", p)),
        next((l.strip()[:90] for l in p.splitlines() if "Join" in l), "?"),
    )

    # --- group quantiles: skew-safe histogram path, no per-group row sort --
    # (round-3 finding: row_number().over(partitionBy(group).orderBy(v))
    # sorted each group's ROWS in one task — a straggler cliff when one
    # language dominates. The rewrite windows over the value HISTOGRAM:
    # the plan must show the map-side-combinable groupBy(group, v) BELOW
    # the window and no row_number at all.)
    lq = ep.QUERIES["len_quantiles"](spark, sf_dir)
    p = plan_of(lq)
    check(
        "len_quantiles: quantile select runs over the value histogram "
        "(no per-group full-row row_number sort; histogram partial-"
        "aggregates map-side)",
        "row_number" not in p and "partial_count" in p,
        "no row_number; partial_count present",
    )

    # --- round-4 ops -------------------------------------------------------
    # lock_checkout: the whole state machine is ONE higher-order aggregate
    # fold — no Python stage, no cartesian; requests group + lock join only
    lc = ep.QUERIES["lock_checkout"](spark, sf_dir)
    p = plan_of(lc)
    check(
        "lock_checkout: JVM-side fold (no Python eval), no cartesian",
        "EvalPython" not in p and "CartesianProduct" not in p,
        "join lines: "
        + "; ".join(
            l.strip()[:70] for l in p.splitlines() if "Join" in l
        )[:160],
    )
    # mix_apply: the per-language weights table is a bounded MODEL artifact
    # broadcast onto the corpus (same rule as length_trim / bigram_lm)
    ma = ep.QUERIES["mix_apply"](spark, sf_dir)
    p = plan_of(ma)
    check(
        "mix_apply: bounded weights table broadcast onto the corpus scan",
        bool(re.search(r"BroadcastHashJoin \[lang", p)),
        next((l.strip()[:90] for l in p.splitlines() if "Join" in l), "?"),
    )
    # turn_lint / turn_transitions: lag window + groupBy share the
    # conversation partitioning — ONE Exchange end-to-end
    for qname in ("turn_lint", "turn_transitions"):
        q = ep.QUERIES[qname](spark, sf_dir)
        p = plan_of(q)
        n_ex = len(re.findall(r"\bExchange\b", p))
        # turn_transitions regroups on (from_role, to_role) → 2 exchanges;
        # turn_lint groups on the window's own key → 1
        limit = 1 if qname == "turn_lint" else 2
        check(
            f"{qname}: ≤{limit} shuffles (window partitioning reused where"
            " the grouping key allows)",
            n_ex <= limit,
            f"Exchange nodes = {n_ex}",
        )
    # emb_quant: map-only error fold, one label-sized groupBy with
    # map-side combine
    eq = ep.QUERIES["emb_quant"](spark, sf_dir)
    p = plan_of(eq)
    check(
        "emb_quant: one groupBy with map-side partial aggregation",
        len(re.findall(r"\bExchange\b", p)) == 1 and "partial_max" in p,
        "one Exchange; partial_max present",
    )
    # consolidate_long: the auto guard is a two-branch union — the compact
    # branch plus the exploded per-field branch — with no forced hints
    clq = ep.QUERIES["consolidate_long"](spark, sf_dir)
    p = plan_of(clq)
    check(
        "consolidate_long: routed two-branch union, no cartesian, no"
        " forced broadcast",
        "Union" in p and "CartesianProduct" not in p
        and "ResolvedHint"
        not in clq._jdf.queryExecution().analyzed().toString(),
        "Union present; no cartesian/hint",
    )

    # sft_examples / extractiveness: ONE Exchange — the bounded context
    # window (resp. the lag window) runs under hash(conv_id) and nothing
    # downstream regroups; all token/array arithmetic is map-only
    for qname in ("sft_examples", "extractiveness"):
        q = ep.QUERIES[qname](spark, sf_dir)
        p = plan_of(q)
        n_ex = len(re.findall(r"\bExchange\b", p))
        check(
            f"{qname}: ONE shuffle (conv window), no Python eval",
            n_ex == 1 and "EvalPython" not in p,
            f"Exchange nodes = {n_ex}",
        )
    # bpe_merges: the pair explode must run on the VOCABULARY grain, not
    # the corpus — i.e. an aggregate sits between the two Generate
    # (explode) nodes: corpus→words explode, groupBy(w), THEN pairs
    # explode per distinct word. Plan text is root-first, so the order is
    # Generate(pairs) … HashAggregate(w) … Generate(words).
    bm = ep.QUERIES["bpe_merges"](spark, sf_dir)
    p = plan_of(bm)
    gens = [m.start() for m in re.finditer(r"\bGenerate\b", p)]
    aggs = [m.start() for m in re.finditer(r"\bHashAggregate\b", p)]
    vocab_grain = (
        len(gens) == 2 and any(gens[0] < a < gens[1] for a in aggs)
    )
    check(
        "bpe_merges: pair explode on the vocabulary grain (aggregate"
        " between the two explodes)",
        vocab_grain,
        f"Generate positions = {len(gens)}, agg-between = {vocab_grain}",
    )
    # dsir_weights: the 16^2-row bucket model is a bounded MODEL artifact
    # → BroadcastHashJoin on the bucket key; the doc-grain sum carries
    # map-side partial aggregation
    dw = ep.QUERIES["dsir_weights"](spark, sf_dir)
    p = plan_of(dw)
    check(
        "dsir_weights: bounded bucket model broadcast; doc-grain agg has"
        " map-side partials",
        bool(re.search(r"BroadcastHashJoin \[b", p)) and "partial_sum" in p,
        next((l.strip()[:90] for l in p.splitlines() if "Join" in l), "?"),
    )

    # curriculum: the only row-grain window must partition by BOTH
    # (source, value) — tie groups, never whole sources (the round-3
    # group_quantiles skew rule); the per-source totals ride a one-row
    # broadcast, and every aggregate partial-aggregates map-side
    cu = ep.QUERIES["curriculum"](spark, sf_dir)
    p = plan_of(cu)
    rn_line = next(
        (l for l in p.splitlines() if "row_number" in l), ""
    )
    check(
        "curriculum: row_number window partitions by (source, value) tie"
        " groups, not whole sources",
        "source" in rn_line and "n_chars" in rn_line,
        rn_line.strip()[:110] or "row_number window absent",
    )
    # every Window node must carry a partition spec (a GLOBAL window's
    # spec has no partition columns before the first ordering direction),
    # the totals fold must actually be the broadcast nested-loop of the
    # 1-row counts array, and both aggregates partial-aggregate map-side
    win_lines = [l for l in p.splitlines() if re.search(r"\bWindow\b", l)]
    global_windows = [
        l for l in win_lines
        if re.search(r"windowspecdefinition\([^,)]*(ASC|DESC)", l)
    ]
    check(
        "curriculum: closed-form interleave (no global sort/window, no"
        " cartesian; totals fold is a 1-row broadcast)",
        "CartesianProduct" not in p
        and "partial_count" in p
        and "BroadcastNestedLoopJoin" in p
        and len(win_lines) == 2
        and not global_windows,
        f"windows = {len(win_lines)}, global = {len(global_windows)},"
        f" BNLJ = {'BroadcastNestedLoopJoin' in p}",
    )
    # best_of_n: NO window — the argmax is one max(struct) aggregate with
    # map-side combine under a single conv_id shuffle
    bo = ep.QUERIES["best_of_n"](spark, sf_dir)
    p = plan_of(bo)
    check(
        "best_of_n: windowless max(struct) argmax, ONE shuffle, map-side"
        " partials",
        "Window" not in p
        and len(re.findall(r"\bExchange\b", p)) == 1
        and "partial_max" in p,
        f"Window absent; Exchange = "
        f"{len(re.findall(r'Exchange', p))}",
    )
    # curate_pipeline: the composed end-to-end plan. The normalized+
    # quality projection is a LAZY checkpoint consumed by four branches
    # (dedup probe, keeper agg, weights per-lang agg + totals) — so the
    # downstream plan must contain ZERO parquet re-scans (the regex
    # normalization runs ONCE); 5 Exchanges total (dedup agg + join pair
    # + weights lang agg + pack window shuffle; the manifest groupBy
    # REUSES the pack window's shard partitioning), ONE partitioned
    # window
    cpq = ep.QUERIES["curate_pipeline"](spark, sf_dir)
    p = plan_of(cpq)
    n_ex = len(re.findall(r"\bExchange\b", p))
    n_scan = len(re.findall(r"Scan parquet|FileScan", p))
    n_win = len(re.findall(r"\bWindow\b", p))
    check(
        "curate_pipeline: composed plan stays bounded — ≤6 Exchanges,"
        " ZERO parquet re-scans (normalize runs once into the lazy"
        " checkpoint), 1 shard-partitioned window, no cartesian",
        n_ex <= 6 and n_scan == 0 and n_win == 1
        and "CartesianProduct" not in p and "EvalPython" not in p,
        f"Exchanges = {n_ex}, parquet scans = {n_scan},"
        f" windows = {n_win}",
    )
    # dedup_weights: both join sides are corpus-cardinality — strategy
    # left to AQE (no ResolvedHint), sizes agg partial-aggregates
    dwq = ep.QUERIES["dedup_weights"](spark, sf_dir)
    p = plan_of(dwq)
    check(
        "dedup_weights: no forced broadcast (both sides corpus-sized),"
        " sizes agg partial-aggregates map-side",
        "ResolvedHint" not in dwq._jdf.queryExecution().analyzed().toString()
        and "partial_count" in p
        and "CartesianProduct" not in p,
        "AQE-decided join; partials present",
    )
    # context_fit: ONE shuffle (the conversation window), no Python
    cf = ep.QUERIES["context_fit"](spark, sf_dir)
    p = plan_of(cf)
    check(
        "context_fit: ONE shuffle (conv window running suffix sum), no"
        " Python eval",
        len(re.findall(r"\bExchange\b", p)) == 1 and "EvalPython" not in p,
        f"Exchange = {len(re.findall(r'Exchange', p))}",
    )
    # normalize: map-only (one pruned scan, zero shuffles)
    nz = ep.QUERIES["normalize"](spark, sf_dir)
    p = plan_of(nz)
    check(
        "normalize: map-only (zero shuffles), no Python",
        "Exchange" not in p and "EvalPython" not in p,
        "no Exchange in plan",
    )
    # hard_negatives: the small query side broadcasts (the exact
    # baseline's BNLJ contract), the different-label predicate sits in
    # the join condition, and WindowGroupLimit prunes per-query top-k
    hn = ep.QUERIES["hard_negatives"](spark, sf_dir)
    p = plan_of(hn)
    check(
        "hard_negatives: broadcast small-Q nested loop with the label"
        " predicate in the join; WindowGroupLimit prunes top-k",
        "BroadcastNestedLoopJoin" in p
        and "WindowGroupLimit" in p,
        next(
            (l.strip()[:100] for l in p.splitlines() if "Join" in l), "?"
        ),
    )
    # pref_pairs: same windowless shape as best_of_n — max+min struct in
    # one aggregate, one shuffle, map-side partials
    pp = ep.QUERIES["pref_pairs"](spark, sf_dir)
    p = plan_of(pp)
    check(
        "pref_pairs: windowless max+min struct argmax/argmin, ONE"
        " shuffle, map-side partials",
        "Window" not in p
        and len(re.findall(r"\bExchange\b", p)) == 1
        and "partial_max" in p and "partial_min" in p,
        f"Exchange = {len(re.findall(r'Exchange', p))}",
    )
    # ngram_diversity: ONE corpus scan (the per-n union shape re-reads
    # and re-tokenizes the corpus once per order — the round-4
    # self-review finding), distinct agg on the gram grain with partial
    # aggregation, no window
    nd = ep.QUERIES["ngram_diversity"](spark, sf_dir)
    p = plan_of(nd)
    n_scans = len(re.findall(r"Scan parquet|FileScan", p))
    check(
        "ngram_diversity: ONE corpus scan (combined (n, gram) explode),"
        " distinct partial-aggregates on the gram grain, no window",
        n_scans == 1
        and "partial_count" in p
        and "Window" not in p
        and "CartesianProduct" not in p,
        f"parquet scans = {n_scans}",
    )
    # heaps_law: first-seen is min(doc_id) per term (map-side partials);
    # the max-id scalar joins as a one-row broadcast, not a collect
    hl = ep.QUERIES["heaps_law"](spark, sf_dir)
    p = plan_of(hl)
    check(
        "heaps_law: map-side partial min/max (first-seen + scalar maxid"
        " broadcast), no cartesian",
        "partial_min" in p and "partial_max" in p
        and "CartesianProduct" not in p,
        "partials present",
    )
    # tokenizer_fertility / k_anonymity: bounded groupBys with map-side
    # partials, no Python eval
    for qname, nex in (("tokenizer_fertility", 1), ("k_anonymity", 2)):
        q = ep.QUERIES[qname](spark, sf_dir)
        p = plan_of(q)
        check(
            f"{qname}: {nex} shuffle(s), map-side partials, no Python",
            len(re.findall(r"\bExchange\b", p)) == nex
            and ("partial_sum" in p or "partial_count" in p)
            and "EvalPython" not in p,
            f"Exchange = {len(re.findall(r'Exchange', p))}",
        )

    # bt_strength: the corpus leaves the plan at the checkpointed
    # match-count table — the final iterated plan must contain ZERO
    # parquet scans (before the lineage-truncation fix it re-scanned
    # the corpus 85×), no cartesian, no Python; per-iteration strength
    # checkpoints keep plan depth O(1) in the iteration count
    bt = ep.QUERIES["bt_strength"](spark, sf_dir)
    p = plan_of(bt)
    n_scan = len(re.findall(r"Scan parquet|FileScan", p))
    check(
        "bt_strength: corpus isolated behind the bounded match-count"
        " checkpoint (ZERO parquet re-scans in the iterated plan), no"
        " cartesian, no Python eval",
        n_scan == 0
        and "CartesianProduct" not in p
        and "EvalPython" not in p,
        f"parquet scans = {n_scan},"
        f" BNLJ = {len(re.findall('BroadcastNestedLoopJoin', p))}",
    )
    # refusal_rate: map-only regex flag + ONE conv-grain groupBy
    rr = ep.QUERIES["refusal_rate"](spark, sf_dir)
    p = plan_of(rr)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "refusal_rate: ONE shuffle (conv groupBy), map-side partials,"
        " no Python eval",
        n_ex == 1 and "partial_sum" in p and "EvalPython" not in p,
        f"Exchange = {n_ex}",
    )
    # ngram_novelty: the reference vocabulary side is corpus-cardinality
    # — strategy left to AQE (no ResolvedHint), doc-grain agg carries
    # map-side partials, never all-pairs
    nn = ep.QUERIES["ngram_novelty"](spark, sf_dir)
    p = plan_of(nn)
    check(
        "ngram_novelty: no forced broadcast of the corpus-sized gram"
        " vocabulary; doc-grain agg partial-aggregates; no cartesian",
        "ResolvedHint" not in analyzed(nn)
        and "partial_count" in p
        and "CartesianProduct" not in p,
        "AQE-decided vocabulary join",
    )
    # epoch_schedule: the per-lang arithmetic is a pure projection on
    # mix_weights' bounded shape — identical Exchange/scan counts (the
    # epoch decomposition must add NO plan structure)
    es = ep.QUERIES["epoch_schedule"](spark, sf_dir)
    p = plan_of(es)
    p_mw = plan_of(mw)
    counts = lambda s: (  # noqa: E731
        len(re.findall(r"\bExchange\b", s)),
        len(re.findall(r"Scan parquet|FileScan", s)),
    )
    check(
        "epoch_schedule: identical plan shape to mix_weights (the epoch"
        " columns are projection-only), 1-row totals broadcast, no"
        " Python eval",
        counts(p) == counts(p_mw)
        and "BroadcastNestedLoopJoin" in p
        and "partial_sum" in p
        and "EvalPython" not in p,
        f"(Exchange, scans): epoch_schedule = {counts(p)},"
        f" mix_weights = {counts(p_mw)}",
    )
    # semantic_decontam: cross-set bucket EQUI-join only — no
    # cartesian/nested-loop over the corpus, no forced broadcast (the
    # probe side is unbounded in general), corpus-id agg partials
    sd = ep.QUERIES["semantic_decontam"](spark, sf_dir)
    p = plan_of(sd)
    check(
        "semantic_decontam: cross-set bucket equi-join (no cartesian /"
        " BNLJ), no forced broadcast, map-side partials",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "ResolvedHint" not in analyzed(sd)
        and "partial_count" in p,
        "join line: "
        + next((l.strip()[:100] for l in p.splitlines() if "Join" in l), "?"),
    )

    # dup_pagerank: the iterations must NOT drag the LSH pair generation
    # or the corpus scan back into the output plan — the degree-annotated
    # edge table, node set, and per-iteration ranks are localCheckpoint-ed,
    # so the FINAL plan reads only ExistingRDD scans (O(1) depth in the
    # iteration count, the connected_components lineage rule) and contains
    # no cartesian or forced broadcast
    pr = ep.QUERIES["dup_pagerank"](spark, sf_dir)
    p = plan_of(pr)
    check(
        "dup_pagerank: lineage cut at checkpoints — final plan has NO"
        " parquet scan / LSH banding, only ExistingRDD reads; no"
        " cartesian, no forced broadcast",
        "FileScan parquet" not in p
        and "Scan ExistingRDD" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "ResolvedHint" not in analyzed(pr),
        f"scans: ExistingRDD ×{len(re.findall('Scan ExistingRDD', p))},"
        f" parquet ×{len(re.findall('FileScan parquet', p))};"
        f" Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )
    sections.append(("dup_pagerank", excerpt(p)))

    # template_mine: the segment-support counts and cluster sizes must
    # partial-aggregate map-side, the size join is an equi-join the
    # optimizer chooses (no forced broadcast — the size table is one row
    # per cluster, corpus-cardinality in the worst case), no cartesian
    tm = ep.QUERIES["template_mine"](spark, sf_dir)
    p = plan_of(tm)
    check(
        "template_mine: map-side partial aggs, AQE-decided size join,"
        " no cartesian, no forced broadcast",
        "partial_count" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "ResolvedHint" not in analyzed(tm),
        f"Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )

    # extract_diff: ONE full-outer equi-join on the unit id (both sides
    # corpus-cardinality — never a broadcast full-outer), groupBy with
    # map-side partials, no Python in the compare path (the dispatcher
    # UDF runs on the new side only, below the join)
    xd = ep.QUERIES["extract_diff"](spark, sf_dir)
    p = plan_of(xd)
    check(
        "extract_diff: full-outer equi-join (SMJ/SHJ, not broadcast),"
        " map-side partials, compare path JVM-side",
        "FullOuter" in p
        and "BroadcastHashJoin" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "partial_sum" in p,
        "join line: "
        + next(
            (l.strip()[:100] for l in p.splitlines() if "FullOuter" in l),
            "?",
        ),
    )

    # group_sample_k: the rank<=k filter must rewrite to WindowGroupLimit
    # so map tasks keep only top-k per group BEFORE the shuffle — the
    # operator's whole scale claim
    gs = ep.QUERIES["group_sample_k"](spark, sf_dir)
    p = plan_of(gs)
    check(
        "group_sample_k: WindowGroupLimit prunes to top-k map-side"
        " (one shuffle)",
        "WindowGroupLimit" in p
        and len(re.findall(r"(?m)Exchange", p)) == 1,
        f"WindowGroupLimit present; Exchange ="
        f" {len(re.findall(r'(?m)Exchange', p))}",
    )

    # rule_overlap: pair expansion is two chained explodes (Generate)
    # bounded by |rules|^2 per doc; the only corpus-sized shuffle is the
    # pair-count groupBy with map-side partials; no forced broadcast
    ro = ep.QUERIES["rule_overlap"](spark, sf_dir)
    p = plan_of(ro)
    check(
        "rule_overlap: corpus explode+groupBy computed ONCE behind a"
        " checkpoint (final plan reads only ExistingRDD — zero Generate"
        " re-runs), no forced broadcast",
        len(re.findall(r"(?m)Generate", p)) == 0
        and "Scan ExistingRDD" in p
        and "ResolvedHint" not in analyzed(ro),
        f"Generate nodes = {len(re.findall(r'(?m)Generate', p))};"
        f" ExistingRDD scans ="
        f" {len(re.findall('Scan ExistingRDD', p))}",
    )

    # event_funnel: every step join/groupBy is keyed on the user id with
    # map-side min partials; the conversion window runs on the N-row
    # union only; no cartesian, no forced broadcast
    ef = ep.QUERIES["event_funnel"](spark, sf_dir)
    p = plan_of(ef)
    check(
        "event_funnel: user-keyed equi-joins with map-side min"
        " partials, no cartesian, no forced broadcast",
        "partial_min" in p
        and "CartesianProduct" not in p
        and "ResolvedHint" not in analyzed(ef),
        f"Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )

    # loop_detect: the lag window, the (conv, island) run groupBy, and
    # the final conv groupBy all run under ONE hash(conv_id) exchange
    # (partitioning on a subset of the grouping keys satisfies the
    # clustered distribution — the consolidate rule)
    ld = ep.QUERIES["loop_detect"](spark, sf_dir)
    p = plan_of(ld)
    check(
        "loop_detect: ONE shuffle end-to-end (island groupBy and conv"
        " fold reuse the window partitioning)",
        len(re.findall(r"(?m)Exchange", p)) == 1,
        f"Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )

    # context_taint: a single bounded-frame window under hash(conv_id)
    ct = ep.QUERIES["context_taint"](spark, sf_dir)
    p = plan_of(ct)
    check(
        "context_taint: map-side flag + ONE window shuffle, bounded"
        " ±2-row frame",
        len(re.findall(r"(?m)Exchange", p)) == 1
        and "RunningWindowFunction" not in p,
        f"Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )

    # conv_neardup: the conversation concat is one groupBy(conv_id) with
    # per-conv bounded state; the pair step is the shared LSH bucketed
    # equi-join (checkpointed bands) — no cartesian, no forced broadcast
    cn = ep.QUERIES["conv_neardup"](spark, sf_dir)
    p = plan_of(cn)
    check(
        "conv_neardup: LSH band equi-join over checkpointed bands"
        " (ExistingRDD), no cartesian, no forced broadcast",
        "Scan ExistingRDD" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "ResolvedHint" not in analyzed(cn),
        f"Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )

    # containment: same bucketed candidate generation as winnow_overlap,
    # and the same sort-merge pinning — at 1.88M docs the static
    # estimate of the explode→aggregate chain collapsed under the
    # threshold and the planner broadcast the ENTIRE 16.3 GiB inverted
    # index (a static BroadcastExchange has no shuffle stage for AQE to
    # re-measure, so it can never be demoted at runtime). Every side
    # here is corpus-cardinality: NO broadcast may appear at all.
    # (audited on the bare operator over the documents table — the demo
    # query's planted-quote corpus construction has its own small
    # self-join that may legitimately broadcast at sf0.01)
    from poc_document_ocr_spark.operators.textstats import (
        winnow_containment_pairs as _wcp,
        winnow_fingerprints as _wfp,
    )

    cp = _wcp(
        _wfp(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), k=8, w=4
        ),
        min_df=2, max_df=10, min_shared=5,
    )
    p = plan_of(cp)
    check(
        "containment: all joins sort-merge (no broadcast of any"
        " corpus-cardinality side), no cartesian, map-side partials",
        "CartesianProduct" not in p
        and "BroadcastExchange" not in p
        and "partial_count" in p,
        f"Exchange = {len(re.findall(r'(?m)Exchange', p))}",
    )

    # compress_ratio: the one rows-only query — map-only Arrow-batched
    # python stage, ZERO shuffles
    cr = ep.QUERIES["compress_ratio"](spark, sf_dir)
    p = plan_of(cr)
    check(
        "compress_ratio: map-only (zero shuffles), Arrow-batched eval",
        "Exchange" not in p and "ArrowEvalPython" in p,
        "ArrowEvalPython present, no Exchange",
    )

    # skew_report: global top-n must run as TakeOrderedAndProject
    # (per-partition heaps), never a full sort; the only broadcast is
    # the 1-row total
    sk = ep.QUERIES["skew_report"](spark, sf_dir)
    p = plan_of(sk)
    check(
        "skew_report: top-n via TakeOrderedAndProject (no full sort),"
        " key counts partial-aggregate map-side",
        "TakeOrderedAndProject" in p and "partial_count" in p,
        next(
            (l.strip()[:90] for l in p.splitlines()
             if "TakeOrderedAndProject" in l),
            "absent",
        ),
    )

    # bm25_topk: the query vocabulary (bounded, model-artifact class)
    # must broadcast INTO the posting stream before any Exchange, so the
    # only corpus-cardinality shuffle is the tf groupBy over matching
    # postings; the per-query top-k must carry a WindowGroupLimit so
    # rank pruning happens before the final sort completes; and no
    # corpus-cardinality side may be force-broadcast (the tf/idf joins
    # stay AQE-decided).
    bm = ep.QUERIES["bm25_topk"](spark, sf_dir)
    p = plan_of(bm)
    bhj = len(re.findall(r"BroadcastHashJoin", p))
    check(
        "bm25_topk: query vocab broadcast pre-shuffle + WindowGroupLimit"
        " top-k, tf agg partial map-side",
        "WindowGroupLimit" in p and bhj >= 1 and "partial_count" in p,
        f"BroadcastHashJoin={bhj}, WindowGroupLimit="
        f"{'WindowGroupLimit' in p}",
    )
    sections.append(("bm25_topk", excerpt(p)))

    # prefix_forks: the fork detector must do its work under the
    # conversation partitioning (one corpus-keyed window) and never
    # force-broadcast anything (the family/max-depth joins are bounded
    # but AQE owns the strategy); the depth cap shows up as a filter
    # below the window, bounding per-conv window state structurally.
    pf = ep.QUERIES["prefix_forks"](spark, sf_dir)
    p = plan_of(pf)
    check(
        "prefix_forks: conv-partitioned prefix window, no forced"
        " broadcast (ResolvedHint absent)",
        "Window" in p and "ResolvedHint" not in p
        and "BroadcastNestedLoopJoin" not in p,
        f"Window={'Window' in p}, hints absent={'ResolvedHint' not in p}",
    )

    # length_bias: the pair construction must stay the max/min(struct)
    # single-shuffle groupBy — NO window anywhere (the oracle uses
    # row_number windows; the Spark plan must not)
    lb = ep.QUERIES["length_bias"](spark, sf_dir)
    p = plan_of(lb)
    check(
        "length_bias: windowless max/min(struct) pairs, map-side"
        " partial aggs",
        "Window" not in p and "partial_count" in p,
        f"Window absent={'Window' not in p}",
    )

    # pmi_pairs: both corpus aggregations partial-aggregate map-side;
    # the 1-row totals ride a broadcast; the vocabulary joins are NOT
    # force-broadcast (corpus-cardinality side — AQE decides)
    pm = ep.QUERIES["pmi_pairs"](spark, sf_dir)
    p = plan_of(pm)
    # (the vocab joins may legitimately plan as BroadcastHashJoin at
    # sf0.01 — size-based, not hinted; at corpus scale the estimates
    # exceed the threshold and AQE plans sort-merge. The structural
    # assertions: every aggregation partial-aggregates map-side, and
    # the ONLY nested-loop join is the 1-row totals cross join — the
    # same bounded-broadcast mechanism mix_weights uses.)
    nlj = len(re.findall(r"BroadcastNestedLoopJoin", p))
    check(
        "pmi_pairs: map-side partials; sole NLJ is the 1-row totals"
        " cross join",
        "partial_count" in p and nlj <= 1,
        f"partials={'partial_count' in p}, NLJ count={nlj}",
    )
    sections.append(("pmi_pairs", excerpt(p)))

    # screen_agreement: one corpus-wide five-counter aggregation with
    # map-side partials; no per-row Python
    sa = ep.QUERIES["screen_agreement"](spark, sf_dir)
    p = plan_of(sa)
    check(
        "screen_agreement: single-row kappa agg partial-aggregates,"
        " no Python UDF",
        "partial_count" in p and "BatchEvalPython" not in p,
        f"partials={'partial_count' in p}",
    )

    # langid_confusion: the heuristic itself is pure column expressions
    # (no Python eval); marginals come from windows over the bounded
    # cell table, so no second corpus-cardinality aggregation exists
    lc = ep.QUERIES["langid_confusion"](spark, sf_dir)
    p = plan_of(lc)
    check(
        "langid_confusion: no Python eval, cell-table windows only",
        "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        and "Window" in p,
        f"python absent={'BatchEvalPython' not in p}",
    )

    # mix_drift: ONE corpus aggregation with map-side partials (both
    # snapshot counts ride the same conditional-sum pass); every window
    # sits ABOVE that aggregation on the bounded source table, so the
    # plan has exactly one hash-partitioned Exchange over corpus data
    # (the source groupBy) — the single-partition window exchanges move
    # ≤|sources| rows. No Python eval, no joins at all.
    md = ep.QUERIES["mix_drift"](spark, sf_dir)
    p = plan_of(md)
    check(
        "mix_drift: one corpus agg w/ map-side partials, joinless,"
        " windows post-agg only",
        "partial_sum" in p and "Join" not in p
        and "BatchEvalPython" not in p
        and p.count("hashpartitioning") <= 1,
        f"partials={'partial_sum' in p}, joins absent={'Join' not in p},"
        f" corpus exchanges={p.count('hashpartitioning')}",
    )
    sections.append(("mix_drift", excerpt(p)))

    # boiler_share: the fp-df table and the source map are BOTH
    # corpus-cardinality — both joins pin sort-merge (the containment
    # rule: the compressed-size estimate under-measures the fp table
    # and a 16.3 GiB broadcast aborted at 1.88M docs before the pin);
    # every aggregation partial-aggregates map-side, no per-row Python
    bs = ep.QUERIES["boiler_share"](spark, sf_dir)
    p = plan_of(bs)
    check(
        "boiler_share: all corpus joins sort-merge (no"
        " BroadcastExchange), map-side partials, no Python eval",
        "BroadcastExchange" not in p and "partial_count" in p
        and "BatchEvalPython" not in p,
        f"broadcast absent={'BroadcastExchange' not in p}",
    )
    sections.append(("boiler_share", excerpt(p)))

    # dup_triangles: the wedge self-join and the closing join must be
    # equi joins (never BroadcastNestedLoopJoin/cartesian — the
    # all-pairs shape the degree-ordered edge-iterator exists to
    # avoid), and the directed edge table is checkpointed so both
    # joins share one lineage
    dt = ep.QUERIES["dup_triangles"](spark, sf_dir)
    p = plan_of(dt)
    check(
        "dup_triangles: equi-join wedges only (no NLJ/cartesian),"
        " no forced broadcast",
        "BroadcastNestedLoopJoin" not in p
        and "CartesianProduct" not in p
        and "ResolvedHint" not in p,
        f"NLJ absent={'BroadcastNestedLoopJoin' not in p}",
    )
    sections.append(("dup_triangles", excerpt(p)))

    # source_cap: the per-source threshold table is bounded
    # (≤|sources| rows) — broadcast BY DESIGN (the bounded-model rule);
    # counts and rollup partial-aggregate map-side
    sc = ep.QUERIES["source_cap"](spark, sf_dir)
    p = plan_of(sc)
    check(
        "source_cap: bounded threshold broadcast + map-side partials,"
        " no sort-merge anywhere",
        "BroadcastHashJoin" in p and "partial_count" in p
        and "SortMergeJoin" not in p,
        f"BHJ={'BroadcastHashJoin' in p}",
    )

    # snapshot_diff: the id join is a PINNED full-outer sort-merge
    # (both snapshots corpus-cardinality — never broadcast), scans
    # prune to (id, group, text)
    sd = ep.QUERIES["snapshot_diff"](spark, sf_dir)
    p = plan_of(sd)
    check(
        "snapshot_diff: pinned FullOuter sort-merge, no broadcast of"
        " either snapshot",
        "FullOuter" in p and "SortMergeJoin" in p
        and "BroadcastExchange" not in p,
        f"SMJ={'SortMergeJoin' in p}",
    )
    sections.append(("snapshot_diff", excerpt(p)))

    # number_support: the support join is a pinned sort-merge on
    # (conv, num) — both sides corpus-cardinality — and no window
    # touches the corpus
    ns = ep.QUERIES["number_support"](spark, sf_dir)
    p = plan_of(ns)
    check(
        "number_support: pinned sort-merge support join, no broadcast,"
        " no corpus window",
        "SortMergeJoin" in p and "BroadcastExchange" not in p
        and "Window" not in p,
        f"SMJ={'SortMergeJoin' in p}",
    )

    # --- session-9 ops -----------------------------------------------------
    # cross_source_dup: pair->source label joins are pinned sort-merge
    # (both sides corpus-cardinality), no cartesian anywhere; the share
    # total windows over the bounded <=|sources|^2 matrix (the one
    # single-partition window is over cells, not the corpus)
    cs = ep.QUERIES["cross_source_dup"](spark, sf_dir)
    p = plan_of(cs)
    check(
        "cross_source_dup: sort-merge pair->source joins, no cartesian,"
        " no forced corpus broadcast",
        "SortMergeJoin" in p and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
        f"SMJ={'SortMergeJoin' in p}",
    )

    # dedup_survivorship: the (id, source) x canonical join is pinned
    # sort-merge; totals ride windows over the bounded per-source table
    dsv = ep.QUERIES["dedup_survivorship"](spark, sf_dir)
    p = plan_of(dsv)
    check(
        "dedup_survivorship: sort-merge source x canonical join,"
        " no cartesian",
        "SortMergeJoin" in p and "CartesianProduct" not in p,
        f"SMJ={'SortMergeJoin' in p}",
    )

    # temporal_split: the cutoff rides the skew-safe histogram path (no
    # row_number over corpus rows; day histogram partial-aggregates
    # map-side) and the pair->flag joins are pinned sort-merge; the only
    # broadcasts are the 1-row cutoff / 1-row stat frames
    tsp = ep.QUERIES["temporal_split"](spark, sf_dir)
    p = plan_of(tsp)
    check(
        "temporal_split: histogram-path cutoff (no corpus row_number"
        " sort), sort-merge flag joins",
        "row_number" not in p and "partial_count" in p
        and "SortMergeJoin" in p,
        f"SMJ={'SortMergeJoin' in p}; no row_number",
    )

    # lang_switch: every window/groupBy keyed on conv_id (never a global
    # corpus window), modal pick is an aggregate (no per-conv sort)
    lsw = ep.QUERIES["lang_switch"](spark, sf_dir)
    p = plan_of(lsw)
    check(
        "lang_switch: conv-partitioned windows only, modal via aggregate"
        " (no row_number), no cartesian",
        "row_number" not in p and "CartesianProduct" not in p
        and "lag(" in p,
        "lag window present; no row_number",
    )

    # --- session-10 ops ----------------------------------------------------
    # encoding_screen: map-only (the whole screen rides the scan — zero
    # shuffles, no Python eval; all three artifact counters are length
    # diffs / regexp_replace inside codegen)
    enc = ep.QUERIES["encoding_screen"](spark, sf_dir)
    p = plan_of(enc)
    check(
        "encoding_screen: map-only (zero Exchange, no Python eval)",
        "Exchange" not in p and "Python" not in p,
        "no Exchange in plan",
    )

    # novelty_curve: no self-join (first-day via fp window), the (fp,day)
    # agg partial-aggregates map-side, and no per-corpus row_number sort
    nov = ep.QUERIES["novelty_curve"](spark, sf_dir)
    p = plan_of(nov)
    check(
        "novelty_curve: windowed first-day (no join), map-side partial"
        " agg on (fp, day)",
        "Join" not in p and "partial_count" in p and "min(day" in p,
        f"Exchanges={p.count('Exchange hashpartitioning')} (fp/day domain"
        " only), no join",
    )

    # lsh_calibration: pair->signature joins pinned sort-merge (both
    # corpus-cardinality), no cartesian/nested-loop anywhere; final
    # rollup is a bounded <=K+1-row table
    cal = ep.QUERIES["lsh_calibration"](spark, sf_dir)
    p = plan_of(cal)
    check(
        "lsh_calibration: sort-merge pair->sig joins, no cartesian /"
        " nested loop",
        "SortMergeJoin" in p and "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
        f"SMJ={p.count('SortMergeJoin')}",
    )

    # corpus_card: the per-doc screen projection is a LAZY checkpoint
    # consumed by TWO aggregates (global fold with two-phase distinct +
    # bounded lang rollup) — downstream plan has ZERO parquet re-scans
    # (screens run once); the lang side joins as a 1-row broadcast
    cc = ep.QUERIES["corpus_card"](spark, sf_dir)
    p = plan_of(cc)
    n_scan = len(re.findall(r"Scan parquet|FileScan", p))
    check(
        "corpus_card: screens run ONCE into the lazy checkpoint (zero"
        " parquet re-scans), no cartesian",
        n_scan == 0 and "CartesianProduct" not in p
        and "EvalPython" not in p,
        f"parquet scans = {n_scan}",
    )

    # --- session-12 ops ----------------------------------------------------
    # fleiss_kappa: all three raters are column expressions in ONE scan
    # projection — a single partial/final fold, no join of rater frames,
    # no window, exactly one parquet scan
    fk = ep.QUERIES["fleiss_kappa"](spark, sf_dir)
    p = plan_of(fk)
    check(
        "fleiss_kappa: three raters fused into one scan (single fold,"
        " no join/window)",
        "partial_count" in p and "Window" not in p
        and "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
        and p.count("FileScan parquet") == 1,
        f"parquet scans = {p.count('FileScan parquet')}",
    )

    # mix_concentration: ONE corpus scan feeding the bounded
    # groupBy(source) with map-side partials; the rank window and the
    # two totals cross-joins run on the |sources|-row aggregate only
    mc = ep.QUERIES["mix_concentration"](spark, sf_dir)
    p = plan_of(mc)
    check(
        "mix_concentration: one corpus scan, map-side partials, bounded"
        " window",
        p.count("FileScan parquet") == 1 and "partial_count" in p,
        f"parquet scans = {p.count('FileScan parquet')}",
    )

    # padding_waste: the (shard, pack) rollup and the shard rollup both
    # reuse the packing window's hash(shard) partitioning — ONE Exchange
    # end-to-end (the shard_pack/pack_manifest rule)
    pw = ep.QUERIES["padding_waste"](spark, sf_dir)
    p = plan_of(pw)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "padding_waste: ONE shuffle (rollups reuse the pack window's"
        " shard partitioning)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )

    # lsh_band_sweep: per config the pair->sig match counting is pinned
    # sort-merge (two SMJ per config, both sides corpus-cardinality),
    # no cartesian / nested loop anywhere in the union
    bs = ep.QUERIES["lsh_band_sweep"](spark, sf_dir)
    p = plan_of(bs)
    n_smj = p.count("SortMergeJoin")
    check(
        "lsh_band_sweep: pinned SMJ match counting per config, no"
        " cartesian",
        n_smj >= 6 and "CartesianProduct" not in p
        and "BroadcastNestedLoop" not in p,
        f"SMJ={n_smj}",
    )

    # --- session-11 ops ----------------------------------------------------
    # weighted_sample: ORDER BY + LIMIT k must execute as
    # TakeOrderedAndProject (per-partition heaps, k rows to the driver),
    # never a global Sort
    ws = ep.QUERIES["weighted_sample"](spark, sf_dir)
    p = plan_of(ws)
    check(
        "weighted_sample: TakeOrderedAndProject top-k (no global sort)",
        "TakeOrderedAndProject" in p
        and "Sort " not in p.replace("TakeOrderedAndProject", ""),
        "TakeOrderedAndProject present",
    )

    # reextract_plan: ONE pinned full-outer sort-merge join on the id,
    # bounded source rollup with map-side partials, no broadcast of
    # either corpus-cardinality side
    rp = ep.QUERIES["reextract_plan"](spark, sf_dir)
    p = plan_of(rp)
    check(
        "reextract_plan: pinned full-outer SMJ, map-side partials, no"
        " corpus broadcast",
        "SortMergeJoin" in p and "FullOuter" in p
        and "partial_sum" in p and "BroadcastExchange" not in p,
        f"SMJ FullOuter={'FullOuter' in p}",
    )

    # screen_confusion: one fold — a single pair of partial/final
    # aggregates over the scan, no join, no window
    sc = ep.QUERIES["screen_confusion"](spark, sf_dir)
    p = plan_of(sc)
    check(
        "screen_confusion: single fold (partial agg, no join/window)",
        "partial_sum" in p and "Join" not in p and "Window" not in p,
        "one conditional-sum fold",
    )

    # --- session-13 ops ----------------------------------------------------
    # hll_distinct: the register table is groupBy(lang, reg).max — the
    # max MUST partial-aggregate map-side (that is the whole point of a
    # mergeable sketch: combine before the shuffle), and nothing in the
    # sketch path is a window or a cartesian
    hd = ep.QUERIES["hll_distinct"](spark, sf_dir)
    p = plan_of(hd)
    check(
        "hll_distinct: map-side partial_max register combine, no"
        " window/cartesian",
        "partial_max" in p and "Window" not in p
        and "CartesianProduct" not in p,
        "partial_max present",
    )

    # bloom_prune: the two bit tables are bounded artifacts (≤4096 rows
    # each regardless of corpus size) and must be BROADCAST; the only
    # nested-loop allowed is the final 1-row × 1-row audit-scalar
    # combine (crossJoin of two aggregates) — never a row-level one
    bp = ep.QUERIES["bloom_prune"](spark, sf_dir)
    p = plan_of(bp)
    n_bhj = p.count("BroadcastHashJoin")
    n_bnl = p.count("BroadcastNestedLoopJoin")
    check(
        "bloom_prune: both bit tables broadcast; only the scalar-combine"
        " nested loop",
        n_bhj >= 2 and "CartesianProduct" not in p and n_bnl <= 1,
        f"BroadcastHashJoin={n_bhj}, scalar BNLJ={n_bnl}",
    )

    # cluster_purity: the component↔label join is corpus-cardinality on
    # both sides — strategy left to AQE, never a forced broadcast; the
    # majority election is min(struct) with map-side partials, windowless
    cp = ep.QUERIES["cluster_purity"](spark, sf_dir)
    p = plan_of(cp)
    check(
        "cluster_purity: windowless min-struct election, map-side"
        " partials, no nested loop",
        "partial_min" in p and "Window" not in p
        and "BroadcastNestedLoop" not in p
        and "CartesianProduct" not in p,
        "partial_min present",
    )

    # bitext_mine (candidates path — the 100 TB shape): every join is
    # equi on the candidate/rank keys (no cartesian, no nested loop), and
    # the per-side top-k rank filters prune map-side (WindowGroupLimit
    # inserts a partial limit BEFORE the rank shuffle, so only ≤k+1 rows
    # per (key, partition) cross the wire instead of the full pair table)
    from poc_document_ocr_spark.operators.similarity import bitext_mine

    ep.load_views(spark, sf_dir, "embeddings")
    _emb = spark.table("embeddings")
    _a = _emb.filter(F.col("vec_id") % 2 == 0).limit(200)
    _b = _emb.filter(F.col("vec_id") % 2 == 1).limit(200)
    _cand = (
        _a.selectExpr("vec_id AS a_id")
        .join(_b.selectExpr("vec_id AS b_id"),
              F.expr("a_id % 7 = b_id % 7"))
    )
    bm = bitext_mine(_a, _b, k=4, candidates=_cand)
    p = plan_of(bm)
    check(
        "bitext_mine(candidates): equi joins only, map-side top-k prune",
        "CartesianProduct" not in p
        and "BroadcastNestedLoop" not in p
        and "WindowGroupLimit" in p,
        f"WindowGroupLimit={'WindowGroupLimit' in p}",
    )
    sections.append(("bitext_mine", excerpt(p)))

    # publish_diff: the manifest fold MUST partial-aggregate map-side
    # (that is what makes the manifest O(buckets) on the wire instead of
    # corpus-sized) and the diff join is bounded-key equi — no window,
    # no cartesian anywhere in the republish plan
    pd_ = ep.QUERIES["publish_diff"](spark, sf_dir)
    p = plan_of(pd_)
    check(
        "publish_diff: map-side partial manifest fold, equi diff join",
        ("partial_bit_xor" in p or "partial_bitxoragg" in p.lower())
        and "Window" not in p
        and "CartesianProduct" not in p,
        f"partial agg present={'partial_bit_xor' in p}",
    )

    # conv_windows: ONE shuffle end-to-end — the cumulative-token window
    # hash-partitions on conv_id and the (conv_id, win_idx) rollup
    # reuses that partitioning (subset-of-keys ClusteredDistribution,
    # the consolidate rule); the window-index explode is map-side
    cw = ep.QUERIES["conv_windows"](spark, sf_dir)
    p = plan_of(cw)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "conv_windows: ONE shuffle (rollup reuses window partitioning)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )

    # hdr_quantiles: the register build MUST partial-aggregate map-side
    # (≤ 63·m rows per group on the wire — the sketch's whole point) and
    # the only windows run over the register domain, never the docs: the
    # doc-grain stages are map-only, so ≤ 2 shuffles total (register
    # groupBy + the bounded per-group cumulative window)
    hq = ep.QUERIES["hdr_quantiles"](spark, sf_dir)
    p = plan_of(hq)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "hdr_quantiles: register fold partial-aggregates map-side",
        "partial_count" in p,
        f"partial_count present={'partial_count' in p}",
    )
    check(
        "hdr_quantiles: ≤2 shuffles (register build + bounded cum window)",
        n_ex <= 2,
        f"Exchange nodes = {n_ex}",
    )

    # epoch_shuffle: ONE shuffle — the row_number window partitions on
    # (epoch, shard) and the audit groupBy reuses that partitioning; the
    # epoch replication and key/shard hashing are map-side
    es = ep.QUERIES["epoch_shuffle"](spark, sf_dir)
    p = plan_of(es)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "epoch_shuffle: ONE shuffle (audit rollup reuses window part.)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )

    # trunc_policy: the fwd/bwd cumulative windows and the per-conv
    # rollup all share the conv_id partitioning (one shuffle); the
    # 3-row unpivot is map-side and only the bounded per-policy
    # aggregate adds a second exchange
    tp = ep.QUERIES["trunc_policy"](spark, sf_dir)
    p = plan_of(tp)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "trunc_policy: 2 shuffles (conv windows+rollup share; tiny final)",
        n_ex == 2,
        f"Exchange nodes = {n_ex}",
    )

    # chat_render: ONE shuffle — the offset window partitions on
    # conv_id and the per-conv audit rollup reuses it; offsets are pure
    # column arithmetic (no collect_list, no conversation string ever
    # materializes in the plan)
    cr = ep.QUERIES["chat_render"](spark, sf_dir)
    p = plan_of(cr)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "chat_render: ONE shuffle (audit reuses offset-window part.)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )
    check(
        "chat_render: no conversation-string materialization",
        "collect_list" not in p,
        f"collect_list present={'collect_list' in p}",
    )

    # maxlen_sweep: all budgets ride ONE prefix-sum window (one corpus
    # scan); the per-(budget, shard, pack) rollup reuses the shard
    # partitioning (subset-of-keys) and only the bounded per-budget
    # rollup adds a second exchange
    ms = ep.QUERIES["maxlen_sweep"](spark, sf_dir)
    p = plan_of(ms)
    n_ex = len(re.findall(r"\bExchange\b", p))
    n_scan = len(re.findall(r"Scan parquet", p))
    check(
        "maxlen_sweep: 2 shuffles (shared prefix window; tiny rollup)",
        n_ex == 2,
        f"Exchange nodes = {n_ex}",
    )
    check(
        "maxlen_sweep: ONE corpus scan for all budgets",
        n_scan == 1,
        f"parquet scans = {n_scan}",
    )

    # vocab_coverage: the only corpus-sized shuffle is the type count
    # (map-side partial) — the coverage windows run over the tiny
    # count-of-counts domain, never a global rank over the vocabulary
    vc = ep.QUERIES["vocab_coverage"](spark, sf_dir)
    p = plan_of(vc)
    check(
        "vocab_coverage: type count partial-aggregates map-side",
        "partial_count" in p,
        f"partial_count present={'partial_count' in p}",
    )
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "vocab_coverage: ≤3 shuffles (types, count-of-counts, tiny window)",
        n_ex <= 3,
        f"Exchange nodes = {n_ex}",
    )

    # pack_mixing: ONE corpus shuffle — the prefix-sum window partitions
    # on shard and BOTH rollups ((pack, source) sums and the per-pack
    # election) reuse it; only the bounded histogram adds an exchange
    pm = ep.QUERIES["pack_mixing"](spark, sf_dir)
    p = plan_of(pm)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "pack_mixing: 2 shuffles (rollups reuse shard window; tiny hist)",
        n_ex == 2,
        f"Exchange nodes = {n_ex}",
    )

    # data_budget: one corpus shuffle (the lang groupBy with map-side
    # partials); the totals join is the broadcast of a 1-row aggregate,
    # never a sort-merge
    db = ep.QUERIES["data_budget"](spark, sf_dir)
    p = plan_of(db)
    # (n_docs' count(1) is column-pruned away — the token sum is the
    # load-bearing aggregate)
    check(
        "data_budget: lang token sum partial-aggregates map-side",
        "partial_sum" in p,
        f"partial_sum present={'partial_sum' in p}",
    )
    check(
        "data_budget: totals joined by broadcast, no SortMergeJoin",
        "BroadcastNestedLoopJoin" in p and "SortMergeJoin" not in p,
        "BNLJ present / SMJ absent",
    )

    # pii_spread: exactly 2 shuffles — the (conv, value) groupBy over the
    # exploded hits is the only corpus-sized one; the per-conv rollup
    # exchanges the already-collapsed value table
    ps = ep.QUERIES["pii_spread"](spark, sf_dir)
    p = plan_of(ps)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "pii_spread: 2 shuffles (hits groupBy; collapsed-conv rollup)",
        n_ex == 2,
        f"Exchange nodes = {n_ex}",
    )

    # tool_call_lint: map-only JSON-path checks, then ONE groupBy on the
    # bounded tool-name domain with map-side partials
    tl = ep.QUERIES["tool_call_lint"](spark, sf_dir)
    p = plan_of(tl)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "tool_call_lint: 1 shuffle (bounded tool-name groupBy)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )
    check(
        "tool_call_lint: verdict counts partial-aggregate map-side",
        "partial_count" in p,
        f"partial_count present={'partial_count' in p}",
    )

    # stats_merge: each slice folds to registers map-side (two corpus
    # scans by design — they simulate two days' independently persisted
    # register jobs); the merge exchanges only register-cardinality rows
    sm = ep.QUERIES["stats_merge"](spark, sf_dir)
    p = plan_of(sm)
    check(
        "stats_merge: register folds partial-aggregate map-side",
        "partial_count" in p and "partial_sum" in p,
        "partial_count & partial_sum present",
    )
    # ...and the merge rollup adds NO third exchange: both union
    # branches exit their folds hash-partitioned on lang with identical
    # expressions, so the final aggregate's clustering requirement is
    # already satisfied through the Union
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "stats_merge: 2 shuffles (per-slice folds; merge reuses their"
        " partitioning)",
        n_ex == 2,
        f"Exchange nodes = {n_ex}",
    )

    # turn_merge: gaps-and-islands — the island fold is a WINDOW over
    # (conv, island) that must reuse the conv window's hash-partitioning
    # (partitioning on a subset of the window keys co-locates every
    # island; only an in-partition re-sort is added), so the corpus
    # shuffles exactly ONCE
    tm = ep.QUERIES["turn_merge"](spark, sf_dir)
    p = plan_of(tm)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "turn_merge: 1 shuffle (island window fold reuses conv window"
        " partitioning)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )

    # sys_prompts: the (text, conv) fold partial-aggregates map-side;
    # at runtime AQE reuses that corpus-sized fold for the totals
    # branch (verified: ReusedExchange in the final adaptive plan), so
    # only census-cardinality work repeats
    sp2 = ep.QUERIES["sys_prompts"](spark, sf_dir)
    p = plan_of(sp2)
    check(
        "sys_prompts: census folds partial-aggregate map-side, no"
        " sort-merge join",
        "partial_count" in p and "SortMergeJoin" not in p,
        "partial_count present, SMJ absent",
    )

    # edit_verify: candidates-only — both text joins are equi on ids,
    # never a cartesian/nested-loop (the O(|a|·|b|) DP must only ever
    # run on admitted candidate pairs)
    ev = ep.QUERIES["edit_verify"](spark, sf_dir)
    p = plan_of(ev)
    check(
        "edit_verify: equi joins only, no cartesian/nested-loop",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p,
        "no CartesianProduct / BNLJ in executed plan",
    )

    # cms_heavy: the counter fold MUST partial-aggregate map-side (the
    # sketch's whole point: d·w rows on the wire, not the token stream)
    # and nothing in the probe/audit path is a cartesian
    ch = ep.QUERIES["cms_heavy"](spark, sf_dir)
    p = plan_of(ch)
    check(
        "cms_heavy: map-side partial counter fold, no cartesian",
        "partial_count" in p and "CartesianProduct" not in p,
        f"partial_count present={'partial_count' in p}",
    )

    # score_calibrate: the ECDF calibration must ride the value
    # HISTOGRAM (map-side-combinable groupBy(src, score) is the only
    # corpus-cardinality stage — the group_quantiles skew rule), never a
    # per-group row sort; the report joins are histogram-cardinality
    sc = ep.QUERIES["score_calibrate"](spark, sf_dir)
    p = plan_of(sc)
    check(
        "score_calibrate: ECDF over the score histogram (map-side"
        " partial fold, no per-group row_number sort, no cartesian)",
        "row_number" not in p
        and "partial_count" in p
        and "CartesianProduct" not in p,
        f"partial_count present={'partial_count' in p},"
        f" row_number absent={'row_number' not in p}",
    )

    # timestamp_lint: same one-window-one-groupBy contract as turn_lint —
    # the conv-grain groupBy must REUSE the lag window's conv_id
    # partitioning, so the whole lint is a single shuffle
    tl = ep.QUERIES["timestamp_lint"](spark, sf_dir)
    p = plan_of(tl)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "timestamp_lint: 1 shuffle (gap groupBy reuses lag-window"
        " partitioning)",
        n_ex == 1,
        f"Exchange nodes = {n_ex}",
    )

    # ai_artifacts: the phrase census's shuffle is bounded by the phrase
    # domain — the per-(doc, phrase) occurrence counts must partial-
    # aggregate map-side so ≤|phrases| rows/task hit the wire; the corpus
    # total joins back as a single-row broadcast
    aa = ep.QUERIES["ai_artifacts"](spark, sf_dir)
    p = plan_of(aa)
    check(
        "ai_artifacts: phrase fold partial-aggregates map-side; corpus"
        " total is a broadcast, no cartesian",
        "partial_count" in p
        and "BroadcastNestedLoopJoin" in p
        and "CartesianProduct" not in p,
        f"partial_count present={'partial_count' in p}",
    )

    # readability: a per-doc score must ride the ingest scan — map-only,
    # zero Exchange, scan pruned to (doc_id, text)
    rb = ep.QUERIES["readability"](spark, sf_dir)
    p = plan_of(rb)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = sorted(c.split(":")[0] for c in m.group(1).split(",")) if m else []
    check(
        "readability: map-only, scan pruned to (doc_id, text)",
        "Exchange" not in p and cols == ["doc_id", "text"],
        f"Exchange absent={'Exchange' not in p}, ReadSchema={cols}",
    )

    # length_token_fit: the five sufficient statistics are ONE map-side-
    # combinable groupBy(source) — a |sources|-row result off a single
    # corpus pass, no window, no second scan
    lf = ep.QUERIES["length_token_fit"](spark, sf_dir)
    p = plan_of(lf)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "length_token_fit: 1 shuffle, sufficient-stats fold partial-"
        "aggregates map-side",
        n_ex == 1 and "partial_count" in p and "row_number" not in p,
        f"Exchange nodes = {n_ex},"
        f" partial_count present={'partial_count' in p}",
    )

    # prefix_join: exact similarity join must stay equi-join shaped —
    # candidates come from the prefix-token equi-join, never a cartesian,
    # and the corpus-cardinality frequency/size tables are never
    # force-broadcast (no ResolvedHint in the analyzed plan)
    pj = ep.QUERIES["prefix_join"](spark, sf_dir)
    p = plan_of(pj)
    lp = pj._jdf.queryExecution().analyzed().toString()
    check(
        "prefix_join: prefix-token equi-joins only (no cartesian, no"
        " forced broadcast of vocab/size tables)",
        "CartesianProduct" not in p
        and "BroadcastNestedLoopJoin" not in p
        and "ResolvedHint" not in lp,
        f"cartesian absent={'CartesianProduct' not in p},"
        f" hint absent={'ResolvedHint' not in lp}",
    )

    # emb_dims: the Arrow partition fold must collapse to d partial rows
    # BEFORE the dim groupBy (no posexplode row fan-out in the default
    # plan), the dim fold partial-aggregates map-side, and the
    # total-variance branch joins back as a single-row broadcast, never
    # a second corpus scan
    ed = ep.QUERIES["emb_dims"](spark, sf_dir)
    p = plan_of(ed)
    n_scans = len(re.findall(r"Scan parquet", p))
    check(
        "emb_dims: Arrow partition fold (no explode fan-out), map-side"
        " dim partials; ONE embeddings scan + single-row broadcast total",
        "MapInPandas" in p
        and "Generate posexplode" not in p
        and "partial_sum" in p
        and n_scans <= 2
        and "CartesianProduct" not in p,
        f"mapInPandas={'MapInPandas' in p},"
        f" explode absent={'Generate posexplode' not in p},"
        f" scans={n_scans}",
    )

    # source_centroids: pass-1 dim fold partial-aggregates map-side, the
    # centroid side joins back as an explicit BROADCAST (bounded
    # sources×dims model artifact — the allowed class), and the distance
    # pass is a HOF + map-side-combinable groupBy; never a cartesian
    sc_df = ep.QUERIES["source_centroids"](spark, sf_dir)
    p = plan_of(sc_df)
    check(
        "source_centroids: grouped Arrow fold (no explode fan-out),"
        " map-side partials, bounded centroid broadcast, no cartesian",
        "partial_count" in p
        and "MapInPandas" in p
        and "Generate posexplode" not in p
        and "BroadcastHashJoin" in p
        and "CartesianProduct" not in p,
        f"partials={'partial_count' in p},"
        f" mapInPandas={'MapInPandas' in p},"
        f" explode absent={'Generate posexplode' not in p},"
        f" bhj={'BroadcastHashJoin' in p}",
    )

    # source_affinity: the |sources|² pair stage joins ONLY the bounded
    # checkpointed centroid table (Scan ExistingRDD on both sides) — a
    # parquet scan inside the pair join would mean corpus-cardinality
    # data leaked into the quadratic stage
    sa_df = ep.QUERIES["source_affinity"](spark, sf_dir)
    p = plan_of(sa_df)
    check(
        "source_affinity: pair stage over bounded checkpointed centroids"
        " only (no corpus scan in the quadratic stage)",
        "Scan ExistingRDD" in p and "Scan parquet" not in p,
        f"rdd scan={'Scan ExistingRDD' in p},"
        f" parquet absent={'Scan parquet' not in p}",
    )

    # pack_order_gain: both packings window-sort under the SAME shard
    # partitioning and their rollups reuse it — the comparison must not
    # introduce a cartesian or a corpus-keyed extra shuffle beyond the
    # two orderings' sorts
    pg = ep.QUERIES["pack_order_gain"](spark, sf_dir)
    p = plan_of(pg)
    check(
        "pack_order_gain: shard-partitioned window sorts only, bounded"
        " shard-grain join, no cartesian",
        "CartesianProduct" not in p and "partial_count" in p,
        f"cartesian absent={'CartesianProduct' not in p}",
    )

    # ess_report: Kish ESS is ONE map-side-combinable groupBy — a
    # |sources|-row result off a single scan, no window, no second pass
    er = ep.QUERIES["ess_report"](spark, sf_dir)
    p = plan_of(er)
    n_ex = len(re.findall(r"\bExchange\b", p))
    check(
        "ess_report: 1 shuffle, sufficient-stats fold partial-aggregates"
        " map-side",
        n_ex == 1 and "partial_count" in p and "row_number" not in p,
        f"Exchange nodes = {n_ex}",
    )

    # retrieval_metrics: both joins are bounded equi (rank≤k slice ×
    # qrels); nothing corpus-cardinality is force-broadcast and no
    # cartesian appears anywhere in the composed bm25+metrics plan
    rm = ep.QUERIES["retrieval_metrics"](spark, sf_dir)
    p = plan_of(rm)
    check(
        "retrieval_metrics: bounded equi joins only (no cartesian)",
        "CartesianProduct" not in p,
        f"cartesian absent={'CartesianProduct' not in p}",
    )

    # reliability: the bin fold must partial-aggregate map-side (≤n_bins
    # rows per task on the wire); the ECE total joins back as a
    # single-row broadcast, not a second corpus scan
    rl = ep.QUERIES["reliability"](spark, sf_dir)
    p = plan_of(rl)
    n_scans = len(re.findall(r"Scan parquet", p))
    check(
        "reliability: bin fold partial-aggregates map-side, ONE corpus"
        " scan + broadcast ECE total",
        "partial_count" in p and n_scans <= 2
        and "CartesianProduct" not in p,
        f"partial_count present={'partial_count' in p}, scans={n_scans}",
    )

    # sim_curve: the cumulative window runs on the bounded bucket
    # domain (≤10 rows), so the single-partition window is safe BY
    # CARDINALITY; the underlying pair generation must stay equi-join
    sv = ep.QUERIES["sim_curve"](spark, sf_dir)
    p = plan_of(sv)
    check(
        "sim_curve: equi-join pair generation, bounded-domain"
        " cumulative window",
        "CartesianProduct" not in p and "partial_count" in p,
        f"cartesian absent={'CartesianProduct' not in p}",
    )

    # script_mix: a per-doc screen must ride the ingest scan — map-only,
    # zero Exchange, scan pruned to (doc_id, text)
    sm = ep.QUERIES["script_mix"](spark, sf_dir)
    p = plan_of(sm)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = sorted(c.split(":")[0] for c in m.group(1).split(",")) if m else []
    check(
        "script_mix: map-only screen, scan pruned to (doc_id, text)",
        "Exchange" not in p and cols == ["doc_id", "text"],
        f"Exchange absent={'Exchange' not in p}, ReadSchema={cols}",
    )

    # --- whole-stage codegen: verify on a non-adaptive plan ---------------
    # (AQE wraps exchange-bearing plans in AdaptiveSparkPlan whose
    # pre-execution string omits codegen annotations; a map-only plan
    # shows its codegen stages as `*(n)` prefixes. NOTE: projections built
    # from higher-order functions — filter/transform lambdas — execute as
    # JVM expression eval OUTSIDE codegen by Spark design; the scan +
    # ColumnarToRow below them is the codegen'd part.)
    p = plan_of(ts)
    check(
        "token_stats: codegen stage present (scan/ColumnarToRow `*(n)`)",
        bool(re.search(r"\*\(\d+\)", p)),
        next(
            (l.strip()[:80] for l in p.splitlines() if "*(" in l), "absent"
        ),
    )

    return checks, sections


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit_plans", cpus=8, shuffle_partitions=8)
    checks, sections = audit(spark, sf_dir)

    lines = [
        "# PLANS — physical-plan audit (generated by scripts/audit_plans.py)",
        "",
        "Properties asserted on the executed plans at sf0.01 — the things",
        "that decide 100 TB behavior: shuffle counts, scan pruning, pushed/",
        "partition filters, join strategies, codegen coverage.",
        "",
        "| check | status | evidence |",
        "|---|---|---|",
    ]
    ok_all = True
    for name, ok, detail in checks:
        ok_all &= ok
        lines.append(
            f"| {name} | {'PASS' if ok else 'FAIL'} | {detail[:140]} |"
        )
    lines.append("")
    for name, ex in sections:
        lines += [f"## {name} (plan head)", "", "```", ex, "```", ""]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(out)
    print(out)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
