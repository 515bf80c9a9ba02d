"""Deterministic distributed sketches: HyperLogLog and Bloom prefilter.

Two bounded-state summary structures a 100 TB curation run leans on where
exact answers need corpus-cardinality shuffles:

* :func:`hll_distinct` — HyperLogLog distinct counting (Flajolet et al.
  2007) with md5-derived registers. The sketch state per group is at most
  256 ``(register, max-rho)`` rows, built with a map-side-combinable
  ``groupBy(...).agg(max)`` — the merge is associative, so partial sketches
  combine across executors/partitions/days without ever re-seeing the data.
  This is THE shape for "distinct n-grams / users / urls per slice" at
  100 TB, where ``count(DISTINCT x)`` would shuffle every distinct value.
* :func:`bloom_prefilter_audit` — a partitioned Bloom filter over a
  benchmark n-gram set, measured against exact membership. The filter is a
  bounded artifact (≤ k·4096 set-bit positions regardless of corpus size),
  so broadcasting it is legal under the repo's broadcast policy (bounded
  model artifacts yes, corpus-cardinality sides no); the corpus-side
  membership test is then two broadcast hash joins — map-only, no shuffle —
  and only the surviving candidates reach the exact decontamination join.

Everything is integer-exact and engine-portable: hashes are ``md5`` hex,
rho (leading-zero rank) is derived from hex-nibble string arithmetic, the
harmonic sum is ``2^(57-rho)`` in DECIMAL(38,0)/HUGEINT, and the
bias-corrected estimate alpha_m * m^2 / S uses the rational form
``7213·m/(1000·(1000m+1079))`` so Spark and the DuckDB oracle agree
bit-for-bit. No floats anywhere.

Reference parity: the reference (martins-vds/poc-document-ocr) has no
sketch layer — these belong to the §2.11 training-data extensions, like
`operators/dedup.py`'s MinHash ladder they sit next to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "hll_distinct",
    "hll_union_novelty",
    "bloom_prefilter_audit",
    "cms_counters",
    "cms_heavy_audit",
    "hdr_registers",
    "hdr_quantiles",
    "moment_registers",
    "merge_moments",
]

#: Register count (2 hex chars of the md5 prefix). Fixed: the rho path
#: reads exactly the next 14 hex chars (56 bits), and the estimate
#: constants below are precomputed for m=256.
_HLL_M = 256

#: alpha_m * m^2 with alpha_m = 0.7213/(1+1.079/m) = 7213·1000·m /
#: (10000·(1000·m+1079)), so the numerator carries m³: 7213·1000·m³ over
#: 10000·(1000·m + 1079) (the standard large-m bias constant). Multiplied
#: through by 2^57 so the division against the 2^(57-rho) harmonic sum
#: cancels the scaling.
_HLL_EST_NUM = 7213 * 1000 * _HLL_M * _HLL_M * _HLL_M * (1 << 57)
_HLL_EST_DEN = 10000 * (1000 * _HLL_M + 1079)


def _rho_expr(tail: str) -> str:
    """SQL for rho = 1 + leading zero bits of the 56-bit value held in the
    14-char hex string column ``tail`` (57 when the value is zero).

    Pure string arithmetic — count leading '0' nibbles, then the zero bits
    inside the first non-zero nibble by its hex digit class — so Spark and
    DuckDB compute the identical integer without any hex→int conversion.
    """
    stripped = f"trim(LEADING '0' FROM {tail})"
    first = f"substring({stripped}, 1, 1)"
    nlz = (
        f"CASE WHEN {first} = '1' THEN 3"
        f" WHEN {first} IN ('2', '3') THEN 2"
        f" WHEN {first} IN ('4', '5', '6', '7') THEN 1"
        f" ELSE 0 END"
    )
    return (
        f"CAST(CASE WHEN {stripped} = '' THEN 57"
        f" ELSE 4 * (14 - length({stripped})) + {nlz} + 1 END AS INT)"
    )


def hll_registers(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "gram",
) -> DataFrame:
    """The HLL sketch state: ``(group, _reg, _mj)`` — at most 256 rows per
    group, built with a map-side-combinable ``groupBy(...).agg(max)``.

    This IS the persistable/mergeable artifact: two register tables over
    different data slices (days, shards, snapshots) union into the sketch
    of the combined slice by re-maxing per register — see
    :func:`hll_union_novelty` — without touching the underlying rows
    again.
    """
    h = F.md5(F.col(value_col).cast("string"))
    keyed = df.select(
        F.col(group_col),
        F.substring(h, 1, 2).alias("_reg"),
        F.expr(_rho_expr("substring(md5(CAST(" + value_col
                         + " AS STRING)), 3, 14)")).alias("_rho"),
    )
    return keyed.groupBy(group_col, "_reg").agg(
        F.max("_rho").alias("_mj")
    )


def hll_estimate(regs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Collapse a register table into ``(group, hll_est, n_regs,
    rho_max)`` — exact integer arithmetic only (see module docstring)."""
    sketch = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_regs"),
        F.max("_mj").cast("int").alias("rho_max"),
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 57 - _mj)"
                   " AS DECIMAL(38,0))")
        ).alias("_s_present"),
    )
    return sketch.select(
        group_col,
        F.expr(
            f"CAST(CAST('{_HLL_EST_NUM}' AS DECIMAL(38,0)) div"
            f" (CAST({_HLL_EST_DEN} AS DECIMAL(38,0)) * (_s_present"
            f" + CAST({_HLL_M} - n_regs AS DECIMAL(38,0))"
            f" * CAST(shiftleft(CAST(1 AS BIGINT), 57) AS DECIMAL(38,0))))"
            f" AS BIGINT)"
        ).alias("hll_est"),
        "n_regs",
        "rho_max",
    )


def hll_distinct(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "gram",
    with_exact: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate next to the exact count.

    Register index = first 2 hex chars of ``md5(value)`` (m=256 registers,
    keyed by the hex string itself — no conversion); rho = leading-zero
    rank of the next 56 bits. The register table is
    ``groupBy(group, reg).agg(max(rho))`` — map-side combinable, at most
    m rows per group out of the shuffle, mergeable with any other sketch
    of the same shape (union + re-max). The estimate is the raw HLL
    harmonic mean ``alpha_m·m²/Σ2^-M_j`` in exact integer arithmetic
    (terms scaled by 2^57, summed in DECIMAL(38,0)); the small-range
    linear-counting correction is deliberately omitted (it needs ln()),
    so expect large ``err_ppm`` for cardinalities well under m — the
    audit columns make that visible rather than hiding it.

    The exact ``count(DISTINCT value)`` per group rides alongside purely
    as the audit baseline; a production job at 100 TB runs ONLY the
    register path — pass ``with_exact=False`` for that shape (it drops
    the count-distinct shuffle entirely).

    Returns ``(group, exact_distinct, hll_est, n_regs, rho_max,
    err_ppm)``, or ``(group, hll_est, n_regs, rho_max)`` when
    ``with_exact=False``.
    """
    regs = hll_registers(df, group_col, value_col)
    est = hll_estimate(regs, group_col)
    if not with_exact:
        return est.select(group_col, "hll_est", "n_regs", "rho_max")
    exact = df.groupBy(group_col).agg(
        F.countDistinct(value_col).cast("long").alias("exact_distinct")
    )
    return exact.join(est, group_col).select(
        group_col,
        "exact_distinct",
        "hll_est",
        "n_regs",
        "rho_max",
        F.expr(
            "CAST(CAST(abs(hll_est - exact_distinct) AS DECIMAL(38,0))"
            " * 1000000 div exact_distinct AS BIGINT)"
        ).alias("err_ppm"),
    )


def hll_union_novelty(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "lang",
    value_col: str = "gram",
    with_exact: bool = True,
) -> DataFrame:
    """Sketch-merge novelty between two corpus snapshots.

    The associativity payoff of :func:`hll_registers`: the union sketch
    of (old ∪ new) is a per-register max over the two register tables — a
    full-outer join on at most 256 rows per group — so
    ``est_novel = est(old ∪ new) − est(old)`` prices what a new crawl
    adds WITHOUT any value-level anti-join. At 100 TB this is the
    operational shape: keep one persisted register table per
    day/shard/snapshot and answer "how much is new?" by merging sketches,
    never rescanning history (cf. `novelty_curve`, the exact
    gram-level twin that does pay the anti-join).

    ``est_novel`` is a signed difference of two noisy estimates — for
    novelty far below the ~6.5% (1.04/√m) per-estimate noise it can go
    negative; it is reported raw, not clamped, so the resolution limit
    stays visible. ``with_exact`` rides the exact per-group novel-value
    count alongside as the audit baseline. Groups present in only one
    snapshot are omitted (a brand-new group's novelty is just its own
    :func:`hll_distinct`; a raw-HLL "estimate" of an absent group would
    be the meaningless empty-sketch constant, not 0).

    Returns ``(group, est_old, est_new, est_union, est_novel[,
    exact_novel])``.
    """
    ra = hll_registers(old, group_col, value_col)
    rb = hll_registers(new, group_col, value_col)
    merged = (
        ra.withColumnRenamed("_mj", "_ma")
        .join(
            rb.withColumnRenamed("_mj", "_mb"),
            [group_col, "_reg"],
            "full_outer",
        )
        .select(
            group_col,
            "_reg",
            F.greatest(
                F.coalesce("_ma", F.lit(0)), F.coalesce("_mb", F.lit(0))
            ).alias("_mj"),
        )
    )
    ea = hll_estimate(ra, group_col).select(
        group_col, F.col("hll_est").alias("est_old")
    )
    eb = hll_estimate(rb, group_col).select(
        group_col, F.col("hll_est").alias("est_new")
    )
    eu = hll_estimate(merged, group_col).select(
        group_col, F.col("hll_est").alias("est_union")
    )
    out = (
        ea.join(eb, group_col)
        .join(eu, group_col)
        .select(
            group_col,
            "est_old",
            "est_new",
            "est_union",
            (F.col("est_union") - F.col("est_old")).alias("est_novel"),
        )
    )
    if not with_exact:
        return out
    xa = old.select(F.col(group_col), F.col(value_col)).distinct()
    xb = new.select(F.col(group_col), F.col(value_col)).distinct()
    xn = (
        xb.join(xa, [group_col, value_col], "left_anti")
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_novel"))
    )
    return out.join(xn, group_col, "left").withColumn(
        "exact_novel", F.coalesce("exact_novel", F.lit(0).cast("long"))
    )


def bloom_prefilter_audit(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Measure a partitioned Bloom prefilter for benchmark decontamination.

    Builds a 2-function partitioned Bloom filter over the benchmark's
    distinct word ``n``-gram hashes: function j's set-bit set is the
    distinct 3-hex-char prefixes of ``md5(gh || '#j')`` (≤ 4096 positions
    each, regardless of benchmark size — a bounded broadcast artifact).
    A corpus gram is a *candidate* iff both its positions are set; exact
    membership against the real benchmark gram set then splits candidates
    into true overlaps and Bloom false positives.

    Shape: the corpus side reduces to DISTINCT gram hashes (the one
    corpus-cardinality shuffle — already paid by `decontaminate`), then
    two broadcast hash joins against the ≤4096-row bit tables (map-only)
    and one AQE-strategy join against the benchmark grams for ground
    truth. In production the exact join consumes ONLY the candidates —
    ``sel_ppm`` is the fraction of the corpus that survives to it, which
    at 100 TB is the difference between shuffling every gram and
    shuffling ~0.1% of them.

    Returns one row: ``(n_corpus_grams, n_bench_grams, n_candidates,
    n_true, n_false_pos, fp_ppm, sel_ppm)`` where ``fp_ppm`` is false
    positives per million non-member grams tested.
    """
    def _grams(df: DataFrame) -> DataFrame:
        words = F.split(F.col(text_col), " ")
        grams = F.expr(
            f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}),"
            f" i -> md5(concat_ws(' ', slice(split({text_col}, ' '), i, {n}))))"
        )
        return (
            df.filter(F.size(words) >= n)
            .select(F.explode(grams).alias("gh"))
            .distinct()
        )

    def _pos(j: int) -> F.Column:
        return F.substring(F.md5(F.concat(F.col("gh"), F.lit(f"#{j}"))), 1, 3)

    bg = _grams(benchmark)
    bits0 = bg.select(_pos(0).alias("_p0")).distinct().withColumn(
        "_h0", F.lit(1)
    )
    bits1 = bg.select(_pos(1).alias("_p1")).distinct().withColumn(
        "_h1", F.lit(1)
    )
    flagged = (
        _grams(corpus)
        .select("gh", _pos(0).alias("_p0"), _pos(1).alias("_p1"))
        .join(F.broadcast(bits0), "_p0", "left")
        .join(F.broadcast(bits1), "_p1", "left")
        .join(bg.withColumn("_hit", F.lit(1)), "gh", "left")
    )
    cand = (F.col("_h0").isNotNull() & F.col("_h1").isNotNull()).cast("long")
    hit = F.col("_hit").isNotNull().cast("long")
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus_grams"),
        F.sum(cand).alias("n_candidates"),
        F.sum(hit).alias("n_true"),
        F.sum(cand * (1 - hit)).alias("n_false_pos"),
    )
    n_bench = bg.agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_grams")
    )
    return agg.crossJoin(n_bench).select(
        "n_corpus_grams",
        "n_bench_grams",
        "n_candidates",
        "n_true",
        "n_false_pos",
        F.expr(
            "CAST(CASE WHEN n_corpus_grams = n_true THEN 0"
            " ELSE CAST(n_false_pos AS DECIMAL(38,0)) * 1000000"
            " div (n_corpus_grams - n_true) END AS BIGINT)"
        ).alias("fp_ppm"),
        F.expr(
            "CAST(CAST(n_candidates AS DECIMAL(38,0)) * 1000000"
            " div n_corpus_grams AS BIGINT)"
        ).alias("sel_ppm"),
    )


def _cms_hash_rows(value_col: str, d: int, w: int):
    """The (cms_row, cms_col) hash pairs for one value — the ONE
    definition shared by the sketch build and the probe side: CMS is
    only correct if both hash identically, so neither may drift.
    Hashing is the repo's portable md5 idiom
    (``conv(substring(md5(value || '|' || row), 1, 15), 16, 10) % w``
    — 60-bit, non-negative, so Spark ``pmod`` and DuckDB ``%``
    agree)."""
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(j).cast("int").alias("cms_row"),
                F.expr(
                    f"pmod(CAST(conv(substring(md5(concat(CAST({value_col}"
                    f" AS STRING), '|', '{j}')), 1, 15), 16, 10)"
                    f" AS BIGINT), {w})"
                ).alias("cms_col"),
            )
            for j in range(d)
        ])
    )


def cms_counters(
    df: DataFrame,
    value_col: str = "token",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """The Count-Min sketch state (Cormode & Muthukrishnan 2005): a
    ``d × w`` counter table ``(cms_row, cms_col, n)`` built with one
    map-side-combinable groupBy — the third mergeable sketch next to
    :func:`hll_registers` and the Bloom bit tables.

    Each value increments one counter per hash row; the shuffle carries
    at most ``d·w`` rows per map task regardless of corpus size, and two
    counter tables over different slices (days, shards) merge by
    re-summing per (row, col) — the same persist-and-merge lifecycle as
    the HLL registers. Hashing is :func:`_cms_hash_rows`, shared with
    the probe side of :func:`cms_heavy_audit`.
    """
    return (
        df.select(_cms_hash_rows(value_col, d, w).alias("_rc"))
        .select("_rc.cms_row", "_rc.cms_col")
        .groupBy("cms_row", "cms_col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_heavy_audit(
    stream: DataFrame,
    candidates: DataFrame,
    value_col: str = "token",
    d: int = 4,
    w: int = 512,
    k: int = 20,
) -> DataFrame:
    """Heavy-hitter audit: query a Count-Min sketch of ``stream`` with a
    bounded ``candidates`` set, rank by estimate, and measure the
    overestimate against the exact counts.

    Shape at 100 TB: the sketch is the only full-stream pass and folds
    to ``d·w`` rows map-side; candidates (a deterministic sample's
    vocabulary, a watchlist, last run's heavy hitters) explode to
    ``|C|·d`` probe rows that equi-join the counter table and take
    ``min`` per candidate — CMS estimates never under-count, so the
    min is a one-sided bound whose slack this audit measures
    (``over_ppm``). The exact-count join exists for the audit the same
    way :func:`hll_distinct`'s ``with_exact`` does; production drops it.

    Returns the top ``k`` by ``(cms_est DESC, value)``:
    ``(value, cms_est, exact_n, over_ppm)``.
    """
    from pyspark.sql import Window as W

    cms = cms_counters(stream, value_col, d=d, w=w)
    probes = candidates.select(F.col(value_col).alias("_v")).distinct()
    probe_rows = probes.select(
        "_v", _cms_hash_rows("_v", d, w).alias("_rc")
    ).select("_v", "_rc.cms_row", "_rc.cms_col")
    est = (
        probe_rows.join(cms, ["cms_row", "cms_col"], "left")
        .groupBy("_v")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_est"))
    )
    exact = (
        stream.select(F.col(value_col).alias("_v"))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    ranked = (
        est.join(exact, "_v", "left")
        .withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy().orderBy(F.desc("cms_est"), F.asc("_v"))
            ),
        )
        .filter(F.col("_rk") <= k)
    )
    return ranked.select(
        F.col("_v").alias(value_col),
        "cms_est",
        F.coalesce("exact_n", F.lit(0)).alias("exact_n"),
        F.expr(
            "CAST(CAST(cms_est - coalesce(exact_n, 0) AS DECIMAL(38,0))"
            " * 1000000 div greatest(coalesce(exact_n, 0), 1) AS BIGINT)"
        ).alias("over_ppm"),
    )


def hdr_registers(
    df: DataFrame,
    value_col: str,
    group_col: str = "lang",
    sub_buckets: int = 8,
) -> DataFrame:
    """The fourth mergeable sketch: HDR-histogram-style quantile
    registers (power-of-two exponent buckets with linear sub-buckets —
    the HdrHistogram / DDSketch family of relative-error quantile
    summaries, here in the integer-exact, engine-portable form the repo's
    other sketches use).

    A positive value ``v`` lands in exponent bucket ``e = length(bin(v))``
    (``= floor(log2 v) + 1`` — pure string arithmetic, no float log) and
    linear sub-bucket ``(v - 2^(e-1)) div max(2^(e-1) div m, 1)``, so the
    bucket's value range is at most ``2^(e-1)/m`` wide: any quantile read
    from the registers carries relative error ≤ ``1/m``. The register
    table is ``(group, e, sub, lo, hi, n)`` built with ONE map-side-
    combinable groupBy — at most ``63·m`` rows per group on the wire
    regardless of corpus size, vs the per-distinct-value histogram the
    exact :func:`~.sampling.group_quantiles` path shuffles. Registers
    over different slices (days, shards, snapshots) merge by re-summing
    per bucket — the same persist-and-merge lifecycle as
    :func:`hll_registers` and :func:`cms_counters`.

    Non-positive values are counted into a single underflow bucket
    ``e = 0`` (lo = hi = 0) so totals reconcile.
    """
    m = int(sub_buckets)
    v = f"CAST({value_col} AS BIGINT)"
    e = f"CASE WHEN {v} < 1 THEN 0 ELSE length(bin({v})) END"
    lower = "shiftleft(CAST(1 AS BIGINT), _e - 1)"
    width = f"greatest({lower} div {m}, CAST(1 AS BIGINT))"
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(e).cast("int").alias("_e"),
            F.expr(v).alias("_v"),
        )
        .select(
            "grp",
            "_e",
            F.expr(
                f"CASE WHEN _e = 0 THEN 0"
                f" ELSE CAST((_v - {lower}) div {width} AS INT) END"
            ).alias("_sub"),
        )
        .groupBy("grp", "_e", "_sub")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "grp",
            F.col("_e").alias("e"),
            F.col("_sub").alias("sub"),
            F.expr(
                f"CASE WHEN _e = 0 THEN CAST(0 AS BIGINT)"
                f" ELSE {lower} + _sub * {width} END"
            ).alias("lo"),
            F.expr(
                f"CASE WHEN _e = 0 THEN CAST(0 AS BIGINT)"
                f" WHEN {lower} < {m} THEN {lower} + _sub * {width}"
                f" ELSE {lower} + (_sub + 1) * {width} - 1 END"
            ).alias("hi"),
            "n",
        )
    )


def hdr_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str = "lang",
    probs_pct: tuple[int, ...] = (50, 90, 99),
    sub_buckets: int = 8,
) -> DataFrame:
    """Quantile probe over :func:`hdr_registers`: for each group and each
    requested percentile, the register bucket that covers the quantile
    index — a ``[q_lo, q_hi]`` bound on the true quantile with relative
    error ≤ ``1/sub_buckets``.

    The cumulative scan runs over the REGISTER domain (≤ ``63·m`` rows
    per group), not the data: the only row-grain work is the register
    build's map-side fold, so the sort window here is bounded however
    large the corpus — the sketch answer to the dominant-group sort skew
    the exact quantile path had to engineer around.

    Returns ``(group, pct, q_lo, q_hi, n_total)``; the quantile index is
    the ceiling rank ``ceil(pct·n/100)`` over ascending buckets.
    """
    from pyspark.sql import Window as W

    regs = hdr_registers(df, value_col, group_col, sub_buckets)
    w = (
        W.partitionBy("grp")
        .orderBy("e", "sub")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = regs.select(
        "grp", "e", "sub", "lo", "hi", "n",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(W.partitionBy("grp")).alias("_tot"),
    )
    pcts = F.explode(
        F.array(*[F.lit(int(p)).cast("int") for p in probs_pct])
    ).alias("pct")
    probed = cum.select("*", pcts).filter(
        # ceil(pct*tot/100) in integers: (pct*tot + 99) div 100
        F.expr("_cum >= (pct * _tot + 99) div 100")
        & F.expr("_cum - n < (pct * _tot + 99) div 100")
    )
    return probed.select(
        F.col("grp").alias(group_col),
        "pct",
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
        F.col("_tot").cast("long").alias("n_total"),
    )


def moment_registers(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_tokens",
) -> DataFrame:
    """Mergeable moment registers per group — the algebraic-aggregate
    state behind incremental corpus statistics: ``(n, sum, sumsq, min,
    max)`` over a BIGINT value column. Every field is commutative and
    associative, so registers over different corpus slices (days,
    shards, snapshots) merge EXACTLY with :func:`merge_moments` —
    tomorrow's corpus stats are yesterday's registers plus the delta
    batch's, never a full rescan. Fourth mergeable sketch family next
    to the HLL registers, Bloom bit tables, and CMS counters (this one
    is lossless).

    ``sumsq`` widens through DECIMAL(38,0): a per-doc token count up to
    ~10⁹ squared and summed over 10¹² docs stays inside 38 digits,
    where BIGINT would overflow at ~3M such docs (ANSI mode would abort
    the job).

    Shape: ONE map-side-combinable groupBy; register cardinality =
    groups.
    """
    v = F.col(value_col).cast("long")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("sum"),
        F.sum(F.expr(
            f"CAST({value_col} AS DECIMAL(38,0))"
            f" * CAST({value_col} AS DECIMAL(38,0))"
        )).cast("decimal(38,0)").alias("sumsq"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def merge_moments(*registers: DataFrame) -> DataFrame:
    """Merge moment-register tables from disjoint corpus slices into
    the registers of their union: ``n``/``sum``/``sumsq`` add, ``min``/
    ``max`` fold — exact by algebra, no approximation. The group column
    is whatever the inputs share (first column by convention).

    Shape: a union of register tables (groups-sized, NOT corpus-sized)
    and one groupBy over it — the whole merge is driver-trivial
    regardless of how much data the registers summarize.
    """
    if not registers:
        raise ValueError("merge_moments needs at least one register table")
    group_col = registers[0].columns[0]
    u = registers[0]
    for r in registers[1:]:
        u = u.unionByName(r)
    return u.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum").cast("long").alias("sum"),
        F.sum("sumsq").cast("decimal(38,0)").alias("sumsq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )
