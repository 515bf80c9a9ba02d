"""Deterministic sampling / splitting / sharding / packing operators.

A training-data pipeline needs reproducible corpus carving: train/val/test
splits, down-samples, shard assignment, and sequence packing must give the
SAME answer on every run at every parallelism — so none of these use RNG.
Everything keys off ``md5(id ':' seed)``: a pure column expression, uniform
over the hex space, identical across engines (the DuckDB oracle reproduces
the exact same hex math), and stable under repartitioning.

Scale notes: split/sample/shard are map-only (one scan, no shuffle — the
filter/label pushes to the parquet scan); packing is one window sort per
shard partition, never a global single-task window.

Reference parity: the reference processes each document independently and
idempotently keyed on its blob name (``PdfProcessorFunction.cs`` overwrite
semantics); these operators extend that same name-keyed determinism to
corpus-level carving, which the reference's single-document flow never
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = [
    "split_key",
    "hash_split",
    "hash_sample",
    "stratified_sample",
    "shard_assign",
    "pack_contiguous",
    "group_quantiles",
    "group_quantiles_approx",
    "mixture_weights",
    "apply_mixture",
    "mixture_kept",
    "epoch_schedule",
    "epoch_shuffle_audit",
    "curation_funnel",
    "length_trim",
    "k_anonymity",
    "group_sample_k",
    "quota_allocation",
    "quota_sample",
    "weighted_sample_k",
    "mix_concentration",
    "padding_waste",
    "pack_order_gain",
    "ess_report",
    "maxlen_sweep",
    "pack_mixing",
    "data_budget",
    "skew_report",
    "mix_drift_report",
    "source_frequency_cap",
    "source_cap_kept",
    "curriculum_order",
]

#: width of the hex prefix compared against split thresholds (8 hex chars
#: = 32 bits of the md5 — granularity 1/2^32, plenty for corpus fractions)
_HEX_W = 8


def split_key(id_col: Column, seed: int = 0) -> Column:
    """The deterministic unit-interval key as a zero-padded hex string:
    first 8 hex chars of ``md5(id ':' seed)``. Lexicographic comparison on
    it IS numeric comparison (fixed width, lowercase hex in both Spark and
    DuckDB) — fractions become hex thresholds, no float anywhere."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}"))), 1, _HEX_W
    )


def _hex_threshold(fraction: float) -> str:
    """``fraction`` of the 32-bit hex space as a zero-padded hex literal.

    Fraction 1.0 must compare above EVERY 8-char hex key, but its exact
    value (``16^8``) is nine chars — which lexicographically sorts BELOW
    most 8-char keys ('10000000 0' < '2…'). Return ``"g"`` instead: one
    char above the hex alphabet, greater than every key in both engines.
    """
    n = min(max(int(round(fraction * (16 ** _HEX_W))), 0), 16 ** _HEX_W)
    if n >= 16 ** _HEX_W:
        return "g"
    return format(n, f"0{_HEX_W}x")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign every row a split label (``train``/``val``/``test``/…) by
    deterministic hash — the reproducible analog of ``randomSplit`` (whose
    assignment depends on partitioning and is NOT stable across runs).

    ``weights`` maps label → fraction (need not sum to 1; the remainder,
    if any, falls into the LAST label). Label boundaries are cumulative
    hex thresholds over :func:`split_key`; a document's label depends only
    on (id, seed), so re-runs, re-partitions, and incremental loads agree.

    Map-only: adds one ``split`` column, no shuffle.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    labels = list(weights)
    key = split_key(F.col(id_col), seed)
    expr = F.lit(labels[-1])  # remainder (and anything ≥ last threshold)
    cum = 0.0
    bounds: list[tuple[str, str]] = []
    for lab in labels[:-1]:
        cum += weights[lab]
        bounds.append((lab, _hex_threshold(cum)))
    for lab, thr in reversed(bounds):
        expr = F.when(key < F.lit(thr), F.lit(lab)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id hash — the
    reproducible analog of ``df.sample`` (sampling that survives re-runs
    and joins: the SAME ids are kept everywhere the same (fraction, seed)
    is used, so sampled tables stay mutually consistent).

    Map-only filter; at 100 TB this is one scan emitting ~fraction of it.
    """
    thr = _hex_threshold(fraction)
    return df.filter(split_key(F.col(id_col), seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic down-sampling — the mixture-reweighting
    primitive of corpus curation (e.g. keep 100% of code, 30% of web, 5%
    of low-quality strata). ``rates`` maps stratum value → keep fraction;
    strata not listed keep ``default_rate`` (0 = drop).

    Each stratum's threshold is a fixed hex literal over the SAME
    :func:`split_key` as :func:`hash_sample`, so per-stratum samples nest
    and compose with global samples at the same seed. Map-only: one CASE
    expression and a filter, pushed to the scan — no shuffle, no RNG.
    """
    key = split_key(F.col(id_col), seed)
    thr = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(key < thr)


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic shard id in ``[0, n_shards)`` per row — the stable
    bucketing used to write a corpus as N reproducible output shards (and
    the partition key :func:`pack_contiguous` packs within).

    The shard is ``(ascii(h1)*256 + ascii(h2)) % n_shards`` over the first
    two hex chars of :func:`split_key` — byte-exact in both engines
    (``conv(hex, 16, 10)`` has no DuckDB twin, ``ascii`` does). Two hex
    chars give 256 distinct underlying values: uniform for shard counts
    that divide smoothly; for n_shards ≫ 256 widen the prefix.
    """
    if not 0 < n_shards:
        raise ValueError("n_shards must be positive")
    key = split_key(F.col(id_col), seed)
    code = (
        F.ascii(F.substring(key, 1, 1)) * 256 + F.ascii(F.substring(key, 2, 1))
    )
    return df.withColumn("shard", F.pmod(code, F.lit(n_shards)).cast("int"))


def pack_contiguous(
    df: DataFrame,
    budget: int,
    part_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    order_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Contiguous sequence packing: within each ``part_col`` partition,
    order documents deterministically (by id) and cut the running token
    total into packs of ``budget`` tokens — the grouping a training loader
    uses to fill fixed-size context windows without a driver-side loop.

    ``order_by`` overrides the fill order (default ``(id_col,)`` —
    arrival order); :func:`pack_order_gain` uses it to measure the fill
    improvement of shortest-first ordering without a second operator.

    ``pack_id = floor(exclusive_prefix_sum(tokens) / budget)``: each pack
    holds ~``budget`` tokens, a document that straddles a boundary belongs
    to the pack it STARTS in (greedy contiguous fill; deterministic, no
    first-fit backtracking — the distributed-friendly packing used when
    exact bin packing isn't worth a global shuffle). ``pack_pos`` is the
    document's offset within its pack's fill order.

    Scale: ONE window sort per partition value — pack within shards
    (:func:`shard_assign`) so no single task ever sorts the whole corpus.
    Emits ``(part_col, id, n_tokens, pack_id, pack_pos)``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order = list(order_by) if order_by else [id_col]
    w = W.partitionBy(part_col).orderBy(*order)
    before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    pack = F.floor(before / F.lit(budget)).cast("long").alias("pack_id")
    return df.select(
        F.col(part_col),
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        pack,
    ).withColumn(
        "pack_pos",
        (F.row_number().over(
            W.partitionBy(part_col, "pack_id").orderBy(*order)
        ) - 1)
        .cast("int"),
    )


def group_quantiles(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_tokens",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Exact per-group quantiles of an integer measure, discrete
    convention: quantile q = the element at 0-based sorted index
    ``floor(q * (n - 1))`` — an ACTUAL value from the data (never an
    interpolated float), so results are bit-identical across engines and
    robust to float summation order. The corpus length-distribution
    report behind chunking/packing budget choices.

    Shape — skew-safe two-pass over the VALUE HISTOGRAM, never a per-group
    row sort (round-3 finding: ``row_number().over(partitionBy(group)
    .orderBy(v))`` funnels each group through ONE task — at 100 TB a
    dominant language (English ≈ half the corpus) is a straggler/spill
    cliff):

    1. ``groupBy(group, v).count()`` — map-side combinable, shuffled on
       (group, v), so the dominant group's ROWS spread across the cluster
       and only its distinct-VALUE domain (bounded: token counts, not
       documents) reaches any one place.
    2. a running-sum window per group over the histogram — input is
       |distinct values per group|, not |rows per group|.
    3. quantile q = element at 0-based sorted index ``floor(q·(n-1))`` =
       the histogram bucket whose cumulative range covers the index
       (``cum - cnt ≤ idx < cum``) — a filter after an equi-join of the
       per-group target indexes.

    Identical output to the row-sort formulation (ties collapse into one
    histogram bucket, so "lowest-ranked duplicate" is free). No collect,
    no approx sketch — :func:`group_quantiles_approx` is the one-pass
    sketch twin validated against this exact path.

    Returns ``(group, q, value)`` with ``q`` scaled to an integer permille
    (250, 500, …) to keep the output all-integer.
    """
    hist = (
        df.select(
            F.col(group_col), F.col(value_col).cast("long").alias("v")
        )
        .groupBy(group_col, "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(W.partitionBy(group_col).orderBy("v"))
    )
    counts = hist.groupBy(group_col).agg(F.sum("cnt").alias("n"))
    targets = F.array(
        *[
            F.struct(
                F.lit(int(round(q * 1000))).alias("q"),
                F.floor(F.lit(q) * (F.col("n") - 1)).alias("idx"),
            )
            for q in qs
        ]
    )
    wanted = counts.select(
        group_col, F.explode(targets).alias("t")
    ).select(group_col, F.col("t.q").cast("int").alias("q"), "t.idx")
    return (
        cum.join(wanted, [group_col])
        .filter(
            (F.col("cum") - F.col("cnt") <= F.col("idx"))
            & (F.col("idx") < F.col("cum"))
        )
        .select(group_col, "q", F.col("v").alias("value"))
    )


def group_quantiles_approx(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_tokens",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """One-pass sketch twin of :func:`group_quantiles`:
    ``approx_percentile`` (Greenwald-Khanna) per group — a single
    map-side-combinable aggregate, no second pass, no window. Use when one
    pass over 100 TB matters more than exactness; rank error is bounded by
    ``1/accuracy`` and returned values are ACTUAL data values, so on
    narrow distributions it frequently equals the exact answer (the pytest
    suite pins it within tolerance of the exact twin). Same output shape:
    ``(group, q, value)``, q in permille.
    """
    pcts = F.array(*[F.lit(float(q)) for q in qs])
    per_group = df.groupBy(group_col).agg(
        F.percentile_approx(
            F.col(value_col).cast("long"), pcts, F.lit(accuracy)
        ).alias("vals")
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(round(q * 1000))).alias("q"),
                F.col("vals")[i].alias("value"),
            )
            for i, q in enumerate(qs)
        ]
    )
    return per_group.select(
        group_col, F.explode(pairs).alias("t")
    ).select(group_col, F.col("t.q").cast("int").alias("q"), "t.value")


def mixture_weights(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based multilingual sampling weights (the XLM-R / mT5
    mixing rule, Conneau et al. arXiv:1911.02116 §3.1): sample language
    ``i`` with probability ``q_i ∝ p_i^α`` where ``p_i`` is its natural
    token share — α < 1 up-samples low-resource languages. α is fixed at
    0.5 because IEEE-754 requires ``sqrt`` to be correctly rounded, so
    Spark and the DuckDB oracle produce the bit-identical double from the
    same BIGINT token count (a general ``pow(p, α)`` is NOT bit-stable
    across libm implementations); the one subsequent ``× 10⁶`` multiply
    and ``floor`` are likewise exact, and everything after is BIGINT.

    Per language: ``n_docs``, ``n_tokens``, natural share ``p_ppm``,
    temperature share ``w_ppm`` (parts-per-million, integer), and the
    up/down-sampling factor ``up_x1000 = 1000·w/p`` a sampler multiplies
    each language's per-epoch draw count by.

    Shape: ONE groupBy(lang) with map-side combine over the scan (the
    token count is a column expression), then a broadcast of the 1-row
    totals — output cardinality = number of languages, so every later
    step is driver-trivial at any corpus size.
    """
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    per_lang = df.groupBy(lang_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_toks).alias("n_tokens"),
    )
    # floor(sqrt(n)·1e6): sqrt and the single multiply are IEEE-exact in
    # both engines; from here on everything is integer arithmetic
    skey = F.floor(
        F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0)
    ).cast("long")
    keyed = per_lang.withColumn("_s", skey)
    totals = keyed.agg(
        F.sum("n_tokens").alias("_tot_tokens"),
        F.sum("_s").alias("_tot_s"),
    )
    # the ×1e6 numerators are widened to DECIMAL(38,0) before the integral
    # divide: in BIGINT a language beyond ~9.2e12 tokens (or a _tot_s near
    # the 64-bit edge) would overflow the multiply, and ANSI mode aborts
    # the job — inconsistent with the 100 TB scale notes (round-3 ADVICE).
    # The quotient is ≤ 1e6 so the final BIGINT cast is always exact.
    return (
        keyed.crossJoin(F.broadcast(totals))
        .select(
            F.col(lang_col),
            "n_docs",
            "n_tokens",
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000"
                " div _tot_tokens AS BIGINT)"
            ).alias("p_ppm"),
            F.expr(
                "CAST(CAST(_s AS DECIMAL(38,0)) * 1000000"
                " div _tot_s AS BIGINT)"
            ).alias("w_ppm"),
        )
        .withColumn(
            "up_x1000",
            F.when(
                F.col("p_ppm") > 0, F.expr("w_ppm * 1000 div p_ppm")
            ),
        )
    )


def apply_mixture(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """APPLY the temperature mixture: deterministic per-language hash
    downsample of over-represented languages toward the α = 0.5 target
    shares — the single-pass composition of :func:`mixture_weights` with
    the hash-threshold sampler. Languages whose natural share exceeds
    their temperature share (``up_x1000 < 1000``) keep a
    ``up_x1000/1000`` fraction of documents; under-represented languages
    keep everything (a one-pass sampler cannot create data — the sampler
    up-weights them at epoch time using ``up_x1000``).

    Everything is engine-exact: the keep threshold is an INTEGER slice of
    the 32-bit hex space (``min(up,1000)·2³² div 1000`` rendered as a
    zero-padded hex literal) compared against the md5 split key, so the
    kept set is a pure function of (id, seed, corpus shares).

    Scale shape: the per-language weights table is output-cardinality =
    #languages — a bounded MODEL artifact, broadcast by design (same rule
    as the bigram model / length-trim bounds); the corpus side is one
    map pass. Returns the per-language attrition report
    ``(lang, up_x1000, n_docs_in, n_docs_kept, n_tokens_kept)``; filter
    composition on the kept flag gives the sampled corpus itself.
    """
    keyed = mixture_kept(
        df, lang_col=lang_col, text_col=text_col, id_col=id_col, seed=seed
    )
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    return keyed.groupBy(lang_col, "up_x1000").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_in"),
        F.sum("kept").cast("long").alias("n_docs_kept"),
        F.sum(F.when(F.col("kept") == 1, n_toks).otherwise(0))
        .cast("long")
        .alias("n_tokens_kept"),
    )


def mixture_kept(
    df: DataFrame,
    weights_from: DataFrame | None = None,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """The mixture sampler's row-level core: ``df``'s rows with their
    ``up_x1000`` weight and an integer ``kept`` flag (1 = survives the
    temperature downsample). :func:`apply_mixture` is the per-language
    rollup of this; composed pipelines filter ``kept = 1`` directly.

    ``weights_from`` optionally computes the language shares on a
    DIFFERENT (usually upstream, cheaper-to-rescan) corpus than the one
    being flagged — e.g. the post-quality corpus instead of the
    post-dedup one, so a composed pipeline's weights branch re-executes
    a map-only scan instead of the whole dedup subtree. The weights
    table is #languages rows — a bounded broadcast-class artifact.
    """
    mw = mixture_weights(
        df if weights_from is None else weights_from,
        lang_col=lang_col, text_col=text_col,
    ).select(lang_col, "up_x1000")
    thr_n = F.expr(
        "least(coalesce(up_x1000, 1000), 1000) * 4294967296 div 1000"
    )
    thr_hex = F.when(thr_n >= F.lit(4294967296), F.lit("g")).otherwise(
        F.format_string("%08x", thr_n)
    )
    return df.join(
        F.broadcast(mw.withColumn("_thr", thr_hex)), lang_col
    ).withColumn(
        "kept",
        F.when(split_key(F.col(id_col), seed) < F.col("_thr"), 1).otherwise(
            0
        ),
    )


def epoch_schedule(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Multi-epoch sampling plan from the temperature mixture: languages
    the mixture UP-samples (``up_x1000 > 1000``) cannot be reached by
    dropping rows — a sampler repeats them. This op decomposes each
    language's factor into whole training epochs plus a fractional
    remainder epoch (served by the deterministic hash sample
    ``mixture_kept`` applies), and prices the plan in tokens — the
    schedule a data-loading layer actually executes (the
    "repeat low-resource languages, subsample high-resource ones"
    recipe of multilingual pretraining, Conneau et al. 1911.02116).

    Same shape as ``mixture_weights`` (one groupBy(lang), bounded
    output); the extra columns are integer arithmetic on the per-lang
    rows. ``planned_tokens = n_tokens · up_x1000 DIV 1000`` is
    DECIMAL(38,0)-widened before the divide (BIGINT would overflow past
    ~9.2e15 tokens under ANSI mode).

    Returns ``(lang, n_docs, n_tokens, up_x1000, full_epochs,
    frac_x1000, planned_tokens)``.
    """
    mw = mixture_weights(df, lang_col=lang_col, text_col=text_col)
    return mw.select(
        lang_col,
        "n_docs",
        "n_tokens",
        F.expr("coalesce(up_x1000, 1000)").alias("up_x1000"),
        F.expr("coalesce(up_x1000, 1000) div 1000").alias("full_epochs"),
        F.expr("coalesce(up_x1000, 1000) % 1000").alias("frac_x1000"),
        F.expr(
            "CAST(CAST(n_tokens AS DECIMAL(38,0))"
            " * coalesce(up_x1000, 1000) div 1000 AS BIGINT)"
        ).alias("planned_tokens"),
    )


def curation_funnel(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """The corpus-curation funnel report: how many documents survive each
    stage of the standard cleaning ladder — quality gate → blocklist
    screen → exact dedup → train/val/test split — as one compact table.
    This is the first artifact a curation run publishes (every C4/CCNet/
    Gopher paper reports exactly this attrition table).

    Shape: the quality and blocklist verdicts are pure column expressions
    (:func:`~.textstats.quality_keep` / :func:`~.textstats.blocklist_keep`)
    evaluated together with the normalized content fingerprint in ONE
    projection (``flags``); stage counts are conditional sums in one
    global aggregate, dedup keepers are one groupBy(fingerprint) over the
    survivors, and the dedup total + per-split finals come out of a single
    ROLLUP over the (small) keeper set. The ``flags`` projection —
    ~tens of bytes/row — is checkpointed LAZILY, so both union branches
    read the one materialization and the corpus text is scanned exactly
    ONCE per action, while merely CONSTRUCTING the DataFrame (plan
    audits, explain, registration) costs nothing — an eager checkpoint
    here would execute a full corpus pass at build time. Checkpoint
    blocks are freed by the ContextCleaner with the result.

    Returns ``(stage, split, n_docs)`` — stages ``raw``/``quality``/
    ``blocklist``/``dedup`` with split ``'all'``, then ``final`` per
    split label.
    """
    from .textstats import blocklist_keep, quality_keep

    text = F.col(text_col)
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    flags = df.select(
        F.col(id_col),
        F.md5(norm).alias("_fp"),
        quality_keep(text).alias("_qk"),
        (quality_keep(text) & blocklist_keep(text)).alias("_sk"),
    ).localCheckpoint(eager=False)
    stages = (
        flags.agg(
            F.count(F.lit(1)).cast("long").alias("raw"),
            F.sum(F.col("_qk").cast("long")).alias("quality"),
            F.sum(F.col("_sk").cast("long")).alias("blocklist"),
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("stage"),
                            F.lit("all").alias("split"),
                            F.col(s).alias("n_docs"),
                        )
                        for s in ("raw", "quality", "blocklist")
                    ]
                )
            ).alias("r")
        )
        .select("r.*")
    )
    keepers = (
        flags.filter(F.col("_sk"))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
    )
    finals = (
        hash_split(keepers, weights, id_col=id_col, seed=seed)
        .rollup("split")
        .agg(
            F.grouping_id().cast("int").alias("_g"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select(
            F.when(F.col("_g") == 1, F.lit("dedup"))
            .otherwise(F.lit("final"))
            .alias("stage"),
            F.when(F.col("_g") == 1, F.lit("all"))
            .otherwise(F.col("split"))
            .alias("split"),
            "n_docs",
        )
    )
    return stages.unionByName(finals)


def length_trim(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_tokens",
    lo: float = 0.05,
    hi: float = 0.95,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group length-tail trim: flag rows whose measure falls outside
    the group's [lo, hi] discrete quantiles — the "drop the shortest and
    longest 5% per language" cleanup a curation pass runs after inspecting
    :func:`group_quantiles` (tails are where truncated pages and
    concatenation accidents live; one global bound would mis-trim every
    low-resource language).

    The bounds table is one row per group (bounded cardinality — the
    language set), so it is BROADCAST back onto the corpus: the only
    corpus-sized costs are the quantile ranking pass and one map-side
    verdict column. Bounds are inclusive, actual data values (discrete
    quantile convention — bit-stable across engines).

    Returns ``(id, group, value, lo_v, hi_v, keep)``.
    """
    q = group_quantiles(df, group_col, value_col, qs=(lo, hi))
    lo_key, hi_key = int(round(lo * 1000)), int(round(hi * 1000))
    bounds = q.groupBy(group_col).agg(
        F.min(F.when(F.col("q") == lo_key, F.col("value"))).alias("lo_v"),
        F.min(F.when(F.col("q") == hi_key, F.col("value"))).alias("hi_v"),
    )
    v = F.col(value_col).cast("long")
    return (
        df.select(F.col(id_col), F.col(group_col), v.alias("value"))
        .join(F.broadcast(bounds), group_col)
        .withColumn(
            "keep",
            (F.col("value") >= F.col("lo_v"))
            & (F.col("value") <= F.col("hi_v")),
        )
    )


def k_anonymity(
    docs: DataFrame,
    qi_cols: tuple[str, ...] = ("source", "lang"),
    band_width: int = 256,
    len_col: str = "n_chars",
) -> DataFrame:
    """k-anonymity risk profile over quasi-identifier combinations: how
    many documents sit in QI-groups too small to hide in (Sweeney 2002's
    k-anonymity, applied as a release-risk report for training corpora —
    a doc whose (source, lang, length-band) combination is unique is
    re-identifiable from metadata alone even with the text redacted).

    The QI is the given columns plus an integer length band
    (``len DIV band_width``). Two aggregations, both map-side
    combinable: QI-grain sizes, then a 4-row risk-band rollup
    (``unique`` k=1, ``rare`` k<5, ``small`` k<10, ``anonymous``).

    Returns ``(risk_band, n_groups, n_docs)``.
    """
    qi = [F.col(c) for c in qi_cols] + [
        F.expr(f"{len_col} DIV {band_width}").alias("_band")
    ]
    groups = docs.groupBy(*qi).agg(
        F.count(F.lit(1)).cast("long").alias("_k")
    )
    band = (
        F.when(F.col("_k") == 1, "unique")
        .when(F.col("_k") < 5, "rare")
        .when(F.col("_k") < 10, "small")
        .otherwise("anonymous")
    )
    return (
        groups.groupBy(band.alias("risk_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("_k").cast("long").alias("n_docs"),
        )
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Curriculum ordering with exact source interleaving — each source's
    documents ranked easiest-first (ascending ``value_col``, doc-id
    tie-break), then the per-source streams interleaved round-robin into
    ONE global training order (curriculum learning, Bengio et al. 2009;
    interleaving prevents the order from front-loading a single source).

    The whole point of this formulation is that the EXACT global position
    is computed with no global sort and no per-source full sort — the two
    shapes that funnel a 100 TB corpus through single tasks:

    * per-source rank rides the skew-safe value-HISTOGRAM shape of
      :func:`group_quantiles` (round-3 fix): cumulative counts run over
      the bounded distinct-value domain, and the only row-grain window
      partitions by (source, value) — tie groups, not sources.
    * the interleave position is CLOSED-FORM given the per-source totals:
      ``pos(r, s) = Σ_{s'} min(cnt_{s'}, r−1) + |{s' < s : cnt_{s'} ≥ r}|
      + 1`` — the totals are a bounded model artifact (one row per
      source) carried as a one-row broadcast array and folded map-side.

    Returns ``(id, source, src_rank, curriculum_pos)`` where
    ``curriculum_pos`` is a permutation of 1..N (pinned by a unit test).
    """
    v = F.col(value_col).cast("long")
    hist = docs.groupBy(
        F.col(source_col).alias("_s"), v.alias("_v")
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    wb = (
        W.partitionBy("_s").orderBy("_v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    below = hist.select(
        "_s", "_v",
        F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_below"),
    )
    wt = W.partitionBy(source_col, value_col).orderBy(id_col)
    ranked = (
        docs.select(id_col, source_col, value_col)
        .join(
            below,
            (F.col(source_col) == F.col("_s")) & (v == F.col("_v")),
        )
        .select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            (F.col("_below") + F.row_number().over(wt))
            .cast("long")
            .alias("src_rank"),
        )
    )
    cnts = docs.groupBy(F.col(source_col).alias("_cs")).agg(
        F.count(F.lit(1)).cast("long").alias("_cn")
    )
    cnt_row = cnts.agg(
        F.sort_array(
            F.collect_list(F.struct("_cs", "_cn"))
        ).alias("_cnts")
    )
    r1 = F.col("src_rank") - 1
    pos = F.aggregate(
        "_cnts",
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.least(x["_cn"], r1)
        + F.when(
            (x["_cs"] < F.col("source")) & (x["_cn"] >= F.col("src_rank")),
            1,
        ).otherwise(0),
    )
    return (
        ranked.crossJoin(F.broadcast(cnt_row))
        .select(
            id_col,
            "source",
            "src_rank",
            (pos + 1).cast("long").alias("curriculum_pos"),
        )
    )


def group_sample_k(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic fixed-``k`` uniform sample per group — the
    inspection/eval-set primitive (:func:`stratified_sample` fixes a
    RATE per group; audits and eval carves want a fixed COUNT: "20
    documents from every source, every run, the same 20").

    Rank within each group by the md5 of ``seed|id`` (engine-portable,
    reproducible, uniform for distinct ids) with the id itself as the
    tiebreak, keep rank ≤ k. Changing ``seed`` draws an independent
    sample; changing corpus membership only locally perturbs it.

    Shape at 10¹² docs: ``row_number`` + the ``rank ≤ k`` filter is
    the shape Spark rewrites into WindowGroupLimit — every map task
    keeps only its top-k per group BEFORE the shuffle, so the exchange
    carries O(groups · k · partitions) rows, not the corpus, and no
    single-group skew cliff exists at small k. One shuffle total.

    Returns the input rows of the sample plus ``sample_rank`` (1-based).
    """
    w = (
        W.partitionBy(group_col)
        .orderBy(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col))),
            F.col(id_col),
        )
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
    )


def quota_allocation(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
) -> DataFrame:
    """Largest-remainder (Hamilton) allocation of a fixed total budget
    ``k`` across strata, proportional to stratum sizes — exact integers,
    no floats, fully deterministic.

    :func:`stratified_sample` fixes a RATE per stratum and
    :func:`group_sample_k` a COUNT per stratum; eval carves and
    annotation budgets fix a TOTAL ("label exactly 10,000 documents,
    proportionally by source"). Hamilton's method: each stratum gets
    ``floor(k·n_i/N)``, and the ``k − Σfloor`` leftover seats (< number
    of strata) go to the largest remainders ``k·n_i mod N``, ties broken
    by stratum value for run-to-run stability.

    Shape: one corpus groupBy(strata) with map-side partials; everything
    after (total cross-join, remainder ranking window) runs on the
    bounded strata-cardinality table. Output is the allocation sheet:
    ``(stratum, n_rows, quota_floor, remainder, extra, quota)`` with
    ``Σ quota = min(k, N)`` (when ``k > N`` every row is wanted and
    quotas are capped at stratum sizes by :func:`quota_sample`).
    """
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = counts.agg(F.sum("n_rows").cast("long").alias("_n"))
    base = counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        "n_rows",
        F.expr(
            f"CAST(CAST(n_rows AS DECIMAL(38,0)) * {k} div _n AS BIGINT)"
        ).alias("quota_floor"),
        F.expr(
            f"CAST(CAST(n_rows AS DECIMAL(38,0)) * {k} % _n AS BIGINT)"
        ).alias("remainder"),
        F.col("_n"),
    )
    # both windows run on the bounded strata-cardinality table only
    w = W.orderBy(F.col("remainder").desc(), F.col(strata_col))
    ranked = base.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_leftover", F.lit(k) - F.sum("quota_floor").over(
            W.partitionBy(F.lit(1))
        )
    )
    return ranked.select(
        strata_col,
        "n_rows",
        "quota_floor",
        "remainder",
        F.when(F.col("_rk") <= F.col("_leftover"), 1)
        .otherwise(0)
        .cast("int")
        .alias("extra"),
    ).select(
        strata_col,
        "n_rows",
        "quota_floor",
        "remainder",
        "extra",
        (F.col("quota_floor") + F.col("extra")).cast("long").alias("quota"),
    )


def quota_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Materialize the :func:`quota_allocation` sheet: the
    :func:`group_sample_k` ranking per stratum, cut at that stratum's
    quota instead of a constant — a fixed-total, proportionally
    stratified, deterministic sample.

    The allocation sheet is strata-cardinality (bounded) and broadcast;
    the rank window is the same WindowGroupLimit-friendly shape as
    ``group_sample_k`` when the max quota is modest. One corpus shuffle
    (the rank window) + one counting pass.
    """
    quotas = quota_allocation(df, k, strata_col).select(strata_col, "quota")
    w = (
        W.partitionBy(strata_col)
        .orderBy(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col))),
            F.col(id_col),
        )
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .join(F.broadcast(quotas), strata_col)
        .filter(F.col("sample_rank") <= F.col("quota"))
        .drop("quota")
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    topn: int = 10,
) -> DataFrame:
    """Key-skew diagnosis for a planned join/groupBy key: the top-``n``
    heaviest keys with their absolute counts and corpus share — the
    number you look at BEFORE deciding to salt, AQE-skew-split, or
    broadcast (north rule: "explicit skew handling for long
    conversations" starts with knowing which conv_ids are long). A key
    holding >1/partitions of the rows is a guaranteed straggler under
    hash partitioning.

    Shape at 10¹² rows: one groupBy(key) with map-side partials (the
    count table is key-cardinality), a 1-row total broadcast-joined
    onto the top slice, and the top-``n`` itself is a global
    ``ORDER BY … LIMIT n`` — Spark executes that as
    TakeOrderedAndProject (per-partition heaps, no full sort, no
    single-task sink). Deterministic: ties break on the key value.

    Returns ``(rank, key, n_rows, share_ppm, cum_share_ppm)`` for the
    ``topn`` heaviest keys.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("long").alias("_total"))
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(topn)
        .crossJoin(F.broadcast(total))
    )
    w = W.orderBy(F.desc("n_rows"), F.asc("key"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "key",
        "n_rows",
        F.expr(
            "CAST(CAST(n_rows AS DECIMAL(38,0)) * 1000000 div _total"
            " AS BIGINT)"
        ).alias("share_ppm"),
        F.expr(
            "CAST(CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, key ASC"
            " ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0)) * 1000000"
            " div _total AS BIGINT)"
        ).alias("cum_share_ppm"),
    )


def mix_drift_report(
    df: DataFrame,
    in_a: Column,
    source_col: str = "source",
) -> DataFrame:
    """Corpus-composition drift between two snapshots: per-source share
    deltas and the total-variation distance, in exact ppm — the
    monitoring query a continuously-ingesting pipeline alerts on when a
    crawl's source mix shifts (a TVD jump means the training mixture
    silently changed even if volume didn't). ``in_a`` is any boolean
    column marking snapshot-A membership (a batch-id predicate, a date
    range, a hash half).

    Shape at 10¹² rows: ONE corpus shuffle down to the bounded source
    table (both snapshot counts come out of the same map-side-combinable
    conditional-sum pass — never two scans); shares, deltas, and the TVD
    all come from windows over those ≤|sources| rows, so the
    single-partition window Spark warns about holds only source-
    cardinality data. TVD = Σ|p_b − p_a| / 2, integer ppm end-to-end
    (DECIMAL(38,0) intermediates — no float drift, no BIGINT overflow
    below 9.2e18 rows per source; an EMPTY snapshot nulls its shares via
    nullif instead of aborting under ANSI division-by-zero).

    Returns ``(source, n_a, n_b, p_a_ppm, p_b_ppm, delta_ppm,
    tvd_ppm)`` — one row per source, ``tvd_ppm`` repeated on each.
    """
    cells = df.groupBy(source_col).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~in_a, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    shares = cells.select(
        source_col,
        "n_a",
        "n_b",
        F.expr(
            "CAST(CAST(n_a AS DECIMAL(38,0)) * 1000000"
            " div nullif(sum(n_a) OVER (), 0) AS BIGINT)"
        ).alias("p_a_ppm"),
        F.expr(
            "CAST(CAST(n_b AS DECIMAL(38,0)) * 1000000"
            " div nullif(sum(n_b) OVER (), 0) AS BIGINT)"
        ).alias("p_b_ppm"),
    ).select(
        "*", (F.col("p_b_ppm") - F.col("p_a_ppm")).alias("delta_ppm")
    )
    return shares.select(
        "*",
        F.expr("sum(abs(delta_ppm)) OVER () div 2")
        .cast("long")
        .alias("tvd_ppm"),
    )


def source_frequency_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Frequency-cap over-crawled sources: deterministically keep
    ~``cap`` documents per source (the C4/RefinedWeb "no domain may
    dominate" rule) by deriving each source's keep fraction from its
    observed count and applying the hash-threshold sampler — the
    skew-correct 100 TB twin of :func:`group_sample_k`: an EXACT
    top-k needs a per-source ordering (a single straggler task on a
    10¹⁰-doc megadomain), while the hash cap is two passes with no
    per-source sort: one bounded groupBy(source) for counts, then a
    map-only flag pass with the ≤|sources| threshold table broadcast
    (the bounded-model-artifact rule). The kept count is binomial
    around ``cap`` (exact when the source is under the cap) and a pure
    function of (id, seed, corpus counts) — stable across reruns and
    partitionings.

    Returns the per-source attrition report ``(source, n_docs_in,
    n_docs_kept, keep_ppm)``; :func:`source_cap_kept` gives the
    row-level kept flag for pipeline composition.
    """
    rep = source_cap_kept(
        df, cap, source_col=source_col, id_col=id_col, seed=seed
    )
    return rep.groupBy(source_col, "keep_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_in"),
        F.sum("kept").cast("long").alias("n_docs_kept"),
    ).select(source_col, "n_docs_in", "n_docs_kept", "keep_ppm")


def source_cap_kept(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Row-level core of :func:`source_frequency_cap`: input rows with
    their source's ``keep_ppm = min(cap, n)·10⁶ div n`` and an integer
    ``kept`` flag. The hex threshold is ``keep_ppm·2³² div 10⁶``
    rendered as a zero-padded literal compared against the shared
    :func:`split_key` — the exact mechanism :func:`mixture_kept` uses,
    so capped and temperature-sampled corpora compose on one key."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    keep_ppm = F.expr(
        f"CAST(CAST(least(CAST({cap} AS BIGINT), _n) AS DECIMAL(38,0))"
        " * 1000000 div _n AS BIGINT)"
    )
    thr_n = F.expr("keep_ppm * 4294967296 div 1000000")
    thr = counts.select(
        source_col,
        keep_ppm.alias("keep_ppm"),
    ).withColumn(
        "_thr",
        F.when(thr_n >= F.lit(4294967296), F.lit("g")).otherwise(
            F.format_string("%08x", thr_n)
        ),
    )
    return df.join(F.broadcast(thr), source_col).withColumn(
        "kept",
        F.when(
            split_key(F.col(id_col), seed) < F.col("_thr"), 1
        ).otherwise(0),
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str = "w_ppm",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted without-replacement sample of exactly k rows.

    The quality-weighted pick a curation pass runs ("give me 1M examples,
    preferring high-quality ones, reproducibly"): each row draws the
    deterministic 60-bit uniform ``u = int(md5(id ':' seed 'w')[:15])``
    and is ranked by ``priority = u div weight`` (BIGINT floor division —
    exact in both engines, no overflow: u < 2⁶⁰) — the k smallest
    priorities win, so doubling a row's weight halves its expected
    priority and selection probability rises monotonically with weight.
    Ties (possible when weights are large enough to collapse the 60-bit
    key, ~2⁶⁰/w distinct priorities remain) break on the id,
    deterministically in both engines.
    This is the integer surrogate of Efraimidis–Spirakis A-Res priority
    sampling (keys ``u^(1/w)``; arXiv:cs/0503089 formulation) — the exact
    ES key needs float exponentiation, which the cross-engine integer
    contract forbids, and ``u/w`` preserves the properties that matter
    operationally: determinism under repartitioning, exact-k output,
    monotone weight preference, and per-weight-class uniformity.

    Weights are positive integers (ppm convention); non-positive weights
    are excluded outright (a zero-weight row must never win).

    Shape: the priority is map-side; selection is ``ORDER BY … LIMIT k``
    which Spark executes as TakeOrderedAndProject — per-partition top-k
    heaps merged on the driver, k rows of driver traffic, NO global sort
    and no single-task window. At 100 TB this is one scan plus a k-row
    merge.

    Returns the selected rows ``(id, weight)`` (k of them, fewer if the
    input is smaller).
    """
    w = F.col(weight_col).cast("long")
    pr = F.expr(
        f"CAST(conv(substring(md5(concat(CAST({id_col} AS STRING),"
        f" ':{seed}w')), 1, 15), 16, 10) AS BIGINT)"
        f" div CAST({weight_col} AS BIGINT)"
    )
    return (
        df.filter(w > 0)
        .select(F.col(id_col), w.alias("weight"), pr.alias("_pr"))
        .orderBy("_pr", id_col)
        .limit(k)
        .select(id_col, "weight")
    )


def mix_concentration(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """Source-concentration audit of the corpus mix, integer-exact.

    Where :func:`mix_drift` compares two mixes, this scores ONE mix's
    concentration — the "is the corpus secretly three domains in a
    trench coat" check a release audit runs: Herfindahl–Hirschman index
    (sum of squared shares; 1e6 = monoculture, 1e6/n = uniform), Gini
    coefficient of the group-size distribution, and the largest
    group's share, all as exact ppm integers both engines reproduce.

    Gini uses the sorted-rank identity ``G = (2·Σᵢ i·w₍ᵢ₎ − (n+1)·ΣW)
    / (n·ΣW)`` (ascending weights, 1-based rank) — no O(n²) pairwise
    join, and ties don't affect the sum so any stable order works.
    HHI floors each share to ppm FIRST and then sums the squares
    (``Σ share_ppm² div 1e6``), the order the oracle replays.

    Shape: ONE groupBy to the bounded group domain with map-side
    partials; the rank window and totals cross-join run on the
    |groups|-row aggregate (driver-trivial at any corpus size — the
    mixture_weights argument). Numerators widen to DECIMAL(38,0)
    before the integral divides (rank·weight reaches ~1e15 at 100 TB;
    BIGINT multiply would overflow under ANSI).

    Returns one row ``(n_groups, total_w, top1_ppm, hhi_ppm,
    gini_ppm)``; a single group yields gini 0 and hhi/top1 1e6.
    """
    w = (
        F.count(F.lit(1)).cast("long")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).cast("long")
    )
    per_group = (
        df.groupBy(group_col).agg(w.alias("_w")).filter(F.col("_w") > 0)
    )
    # ONE linear chain over the bounded aggregate (no branch re-derives
    # the corpus scan — audited): rank + total via windows on the
    # |groups|-row table, per-group share, then a single fold
    ranked = per_group.select(
        "_w",
        F.row_number()
        .over(W.orderBy(F.col("_w").asc(), F.col(group_col).asc()))
        .cast("long")
        .alias("_i"),
    ).withColumn(
        "_tot",
        F.sum("_w").over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).cast("long"),
    ).withColumn(
        "_share_ppm",
        F.expr(
            "CAST(CAST(_w AS DECIMAL(38,0)) * 1000000 div _tot AS BIGINT)"
        ),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("_tot").cast("long").alias("total_w"),
        F.max("_w").cast("long").alias("_top1"),
        F.sum(F.expr("CAST(_i AS DECIMAL(38,0)) * _w")).alias("_iw"),
        F.expr(
            "CAST(sum(CAST(_share_ppm AS DECIMAL(38,0)) * _share_ppm)"
            " div 1000000 AS BIGINT)"
        ).alias("hhi_ppm"),
    ).select(
        "n_groups",
        "total_w",
        F.expr(
            "CAST(CAST(_top1 AS DECIMAL(38,0)) * 1000000 div total_w"
            " AS BIGINT)"
        ).alias("top1_ppm"),
        "hhi_ppm",
        F.expr(
            "CAST((2 * _iw - (CAST(n_groups AS DECIMAL(38,0)) + 1)"
            " * total_w) * 1000000"
            " div (CAST(n_groups AS DECIMAL(38,0)) * total_w) AS BIGINT)"
        ).alias("gini_ppm"),
    )


def padding_waste(
    packed: DataFrame,
    budget: int,
    part_col: str = "shard",
    tokens_col: str = "n_tokens",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Per-shard padding/overflow audit of a contiguous packing.

    The loader-efficiency twin of the pack manifest: greedy contiguous
    packing (:func:`pack_contiguous`) leaves two kinds of waste — packs
    that close UNDER budget (their tail is padding the trainer burns
    attention on) and packs whose boundary-straddling last document
    runs them OVER budget (tokens the loader truncates or re-splits).
    This rolls both up per shard: total padding and overflow tokens
    against the ``n_packs × budget`` capacity, plus the exact-ppm fill
    rate — the number that decides whether the packing budget or the
    document chunking needs retuning before a run burns cluster-months.

    Shape: groupBy(part, pack) REUSES the packing window's (part)
    partitioning (one Exchange total, the pack-manifest argument),
    then a bounded per-shard rollup with map-side partials.

    Returns ``(part_col, n_packs, n_docs, used_tokens, capacity,
    pad_tokens, overflow_tokens, fill_ppm)`` where ``fill_ppm =
    min(pack_tokens, budget)·1e6 div capacity`` (the share of paid-for
    context actually filled with real tokens).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    per_pack = packed.groupBy(part_col, pack_col).agg(
        F.count(F.lit(1)).cast("long").alias("_docs"),
        F.sum(tokens_col).cast("long").alias("_tok"),
    )
    b = F.lit(budget).cast("long")
    return (
        per_pack.groupBy(part_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("_docs").cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("used_tokens"),
            F.sum(F.greatest(b - F.col("_tok"), F.lit(0).cast("long")))
            .cast("long")
            .alias("pad_tokens"),
            F.sum(F.greatest(F.col("_tok") - b, F.lit(0).cast("long")))
            .cast("long")
            .alias("overflow_tokens"),
            F.sum(F.least(F.col("_tok"), b)).cast("long").alias("_filled"),
        )
        .select(
            part_col,
            "n_packs",
            "n_docs",
            "used_tokens",
            (F.col("n_packs") * budget).cast("long").alias("capacity"),
            "pad_tokens",
            "overflow_tokens",
            F.expr(
                f"CAST(CAST(_filled AS DECIMAL(38,0)) * 1000000"
                f" div (n_packs * {budget}) AS BIGINT)"
            ).alias("fill_ppm"),
        )
    )


def epoch_shuffle_audit(
    docs: DataFrame,
    n_epochs: int = 3,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Reproducible multi-epoch training-order assignment, audited: each
    epoch gets its own deterministic global shuffle (order key =
    ``md5(id ':e' epoch ':' seed)``), documents land in one of 16 hash
    shards, and positions within a shard follow the key order — the
    data-order layer a training run needs to be RE-RUNNABLE (same seed
    ⇒ byte-identical batch order) while still decorrelating epochs
    (different epoch ⇒ a fresh permutation).

    This is what ``df.orderBy(rand())`` cannot give: ``rand()`` depends
    on partition layout, so a retry, a different file split, or AQE
    re-planning silently changes the training order. Here the key is a
    pure function of (id, epoch, seed).

    Scale shape: key and shard derivation are map-only (the shard is the
    FIRST HEX CHAR of a second md5 slice — 16 shards with no hex→int
    conversion, so the same expression runs in the DuckDB oracle; wider
    fleets take more hex chars for 16^k shards). The epoch replication
    is a map-side explode. The single shuffle is the ``row_number``
    window over (epoch, shard) — uniform md5 keys, so no shard skew by
    construction — and it doubles as the sink partitioning for
    per-shard sequence files. The audit output is BOUNDED
    (``n_epochs · 16`` rows): per (epoch, shard) the doc count, the key
    range, and an order fingerprint ``Σ (pos·id) mod p`` (p = 10⁹+7;
    both factors reduce mod p BEFORE the multiply so the product stays
    under ~10¹⁸ — 64-bit-hash ids and 10¹²-row shards never overflow
    BIGINT under ANSI mode, a failure the 1.88M-row bench caught when
    ids were xxhash64 values — and the term sum widens to
    DECIMAL(38,0)) that pins the exact permutation: swapping two docs
    changes it by ``(pos_i−pos_j)(id_i−id_j) mod p``, without shipping
    the order itself.

    Returns ``(epoch, shard, n_docs, min_key, max_key, order_fp)``.
    """
    if n_epochs <= 0:
        raise ValueError("n_epochs must be positive")
    epochs = F.explode(
        F.array(*[F.lit(e).cast("int") for e in range(n_epochs)])
    ).alias("epoch")
    keyed = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(f":s:{seed}"))), 1, 1
        ).alias("shard"),
        epochs,
    ).withColumn(
        "_key",
        F.substring(
            F.md5(F.concat(
                F.col("_id").cast("string"),
                F.lit(":e"),
                F.col("epoch").cast("string"),
                F.lit(f":{seed}"),
            )), 1, 8,
        ),
    )
    w = W.partitionBy("epoch", "shard").orderBy("_key", "_id")
    pos = keyed.withColumn("pos", F.row_number().over(w).cast("long"))
    return pos.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("_key").alias("min_key"),
        F.max("_key").alias("max_key"),
        F.expr(
            "CAST(sum(CAST(pmod(pmod(pos, 1000000007)"
            " * pmod(_id, 1000000007), 1000000007)"
            " AS DECIMAL(38,0))) % 1000000007 AS BIGINT)"
        ).alias("order_fp"),
    )


def maxlen_sweep(
    packed_input: DataFrame,
    budgets: tuple[int, ...] = (128, 256, 512, 1024),
    part_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Packing-budget tuning curve: the padding / overflow / fill-rate
    audit of :func:`padding_waste` evaluated at a GRID of candidate
    context budgets in one pass — the sweep a training team runs before
    fixing max sequence length, where each point trades padding waste
    (budget too big) against boundary overflow (budget too small).

    The trick that keeps the sweep one-pass: every budget's packing
    derives from the SAME exclusive prefix sum (``pack_id = before div
    b`` — :func:`pack_contiguous`'s closed form), so the corpus is
    scanned once, the single ``part_col`` window is shared by all
    budgets, and the per-budget explode is map-side (``|budgets|``
    bounded copies of an 8-byte pair, not of the documents). The
    per-(budget, part, pack) rollup hash-reuses the window's
    partitioning (subset-of-keys), then a bounded global rollup per
    budget.

    Returns one row per budget: ``(budget, n_packs, n_docs,
    used_tokens, capacity, pad_tokens, overflow_tokens, fill_ppm)`` —
    same column contract as :func:`padding_waste` minus the shard
    grain.
    """
    if not budgets or any(b <= 0 for b in budgets):
        raise ValueError("budgets must be non-empty and positive")
    w = W.partitionBy(part_col).orderBy(id_col)
    before = F.coalesce(
        F.sum(F.col(tokens_col).cast("long")).over(
            w.rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    # NOTE: part_col keeps its own name end-to-end — aliasing it would
    # sever the window's output-partitioning lineage at the explode
    # (GenerateExec propagates partitioning but not alias rewrites), and
    # the per-pack rollup would re-shuffle what is already clustered
    base = packed_input.select(
        F.col(part_col),
        F.col(tokens_col).cast("long").alias("_tok"),
        before.alias("_before"),
    )
    grid = F.explode(
        F.array(*[F.lit(int(b)).cast("long") for b in budgets])
    ).alias("budget")
    per_pack = (
        base.select(part_col, "_tok", "_before", grid)
        .select(
            "budget",
            part_col,
            F.expr("_before div budget").alias("_pack"),
            "_tok",
        )
        .groupBy("budget", part_col, "_pack")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_docs"),
            F.sum("_tok").cast("long").alias("_ptok"),
        )
    )
    return (
        per_pack.groupBy("budget")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("_docs").cast("long").alias("n_docs"),
            F.sum("_ptok").cast("long").alias("used_tokens"),
            F.sum(F.greatest(F.col("budget") - F.col("_ptok"),
                             F.lit(0).cast("long")))
            .cast("long").alias("pad_tokens"),
            F.sum(F.greatest(F.col("_ptok") - F.col("budget"),
                             F.lit(0).cast("long")))
            .cast("long").alias("overflow_tokens"),
            F.sum(F.least(F.col("_ptok"), F.col("budget")))
            .cast("long").alias("_filled"),
        )
        .select(
            "budget",
            "n_packs",
            "n_docs",
            "used_tokens",
            (F.col("n_packs") * F.col("budget")).cast("long")
            .alias("capacity"),
            "pad_tokens",
            "overflow_tokens",
            F.expr(
                "CAST(CAST(_filled AS DECIMAL(38,0)) * 1000000"
                " div (n_packs * budget) AS BIGINT)"
            ).alias("fill_ppm"),
        )
    )


def pack_mixing(
    docs: DataFrame,
    budget: int,
    part_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    source_col: str = "source",
) -> DataFrame:
    """Cross-document contamination audit of contiguous packing: how
    many distinct sources share each training pack, and how pure packs
    are — without an attention-reset mask, every extra source in a pack
    bleeds into every sequence packed after it, so the pack-purity
    distribution is the exposure measure a pretraining run checks
    before choosing between plain packing and block-diagonal masking.

    Packs are re-derived with :func:`pack_contiguous`'s closed form
    (``pack_id = exclusive_prefix_sum div budget``) so the source
    column rides along without a join. Both rollups after the ONE
    prefix-sum window reuse its ``part_col`` partitioning (per-(pack,
    source) token sums, then a ``max`` over them electing each pack's
    dominant-source token mass — order-insensitive aggregates, no
    second window), and the output
    is the BOUNDED histogram over distinct-source counts.

    Returns one row per n_sources value: ``(n_sources, n_packs,
    n_docs, pack_tokens, top_source_tokens, purity_ppm)`` where
    ``purity_ppm`` is the exact token share of each pack's dominant
    source, aggregated over packs in the bucket.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = W.partitionBy(part_col).orderBy(id_col)
    before = F.coalesce(
        F.sum(F.col(tokens_col).cast("long")).over(
            w.rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    packed = docs.select(
        F.col(part_col),
        F.col(source_col).alias("_src"),
        F.col(tokens_col).cast("long").alias("_tok"),
        before.alias("_before"),
    ).select(
        part_col,
        "_src",
        "_tok",
        F.expr(f"_before div {int(budget)}").alias("_pack"),
    )
    per_src = packed.groupBy(part_col, "_pack", "_src").agg(
        F.count(F.lit(1)).cast("long").alias("_docs"),
        F.sum("_tok").cast("long").alias("_stok"),
    )
    per_pack = per_src.groupBy(part_col, "_pack").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("_docs").cast("long").alias("_docs"),
        F.sum("_stok").cast("long").alias("_ptok"),
        F.max("_stok").alias("_top"),
    )
    return (
        per_pack.groupBy("n_sources")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("_docs").cast("long").alias("n_docs"),
            F.sum("_ptok").cast("long").alias("pack_tokens"),
            F.sum("_top").cast("long").alias("top_source_tokens"),
        )
        .select(
            "n_sources",
            "n_packs",
            "n_docs",
            "pack_tokens",
            "top_source_tokens",
            F.expr(
                "CAST(CAST(top_source_tokens AS DECIMAL(38,0)) * 1000000"
                " div greatest(pack_tokens, 1) AS BIGINT)"
            ).alias("purity_ppm"),
        )
    )


def data_budget(
    df: DataFrame,
    budget_tokens: int,
    repeat_cap_x1000: int = 4000,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Epochs-to-exhaustion planner for a data-constrained training run
    (Muennighoff et al. arXiv:2305.16264: repeating data beyond ~4
    epochs yields rapidly diminishing returns): given a target training
    budget ``B`` tokens and the temperature mixture's per-language
    shares, how many tokens each language must SUPPLY (``B·w``), how
    many epochs of its available data that demand implies, and whether
    it crosses the repeat cap — the table that tells a data team which
    languages need new collection before the run is scoped.

    All arithmetic after :func:`mixture_weights` is integer-exact:
    ``demand_tokens = B·w_ppm div 10⁶`` and
    ``epochs_x1000 = 1000·demand div available`` both widen through
    DECIMAL(38,0) so a 10¹³-token budget cannot overflow (same ANSI-mode
    rule as the ppm shares themselves).

    Shape: everything downstream of the one ``groupBy(lang)`` in
    :func:`mixture_weights` operates on the languages-sized table —
    driver-trivial at any corpus size.

    Returns per language: ``(lang, n_tokens, w_ppm, demand_tokens,
    epochs_x1000, over_cap)``.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if repeat_cap_x1000 <= 0:
        raise ValueError("repeat_cap_x1000 must be positive")
    mw = mixture_weights(df, lang_col=lang_col, text_col=text_col)
    return (
        mw.select(
            lang_col,
            "n_tokens",
            "w_ppm",
            F.expr(
                f"CAST(CAST(w_ppm AS DECIMAL(38,0)) * {int(budget_tokens)}"
                " div 1000000 AS BIGINT)"
            ).alias("demand_tokens"),
        )
        .withColumn(
            "epochs_x1000",
            F.expr(
                "CAST(CAST(demand_tokens AS DECIMAL(38,0)) * 1000"
                " div greatest(n_tokens, 1) AS BIGINT)"
            ),
        )
        .withColumn(
            "over_cap", F.col("epochs_x1000") > F.lit(int(repeat_cap_x1000))
        )
    )


def pack_order_gain(
    df: DataFrame,
    budget: int,
    part_col: str = "shard",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Fill-rate gain of shortest-first packing over arrival-order
    packing, per shard — the measurement that decides whether a loader
    should pay the per-shard sort before packing.

    Contiguous packing's waste comes from boundary-straddling documents;
    ordering a shard's documents shortest-first puts the large straddle-
    prone documents where the prefix sum crosses budget multiples least
    often, typically cutting overflow. This op packs BOTH ways (same
    :func:`pack_contiguous`, only ``order_by`` differs), audits both
    with :func:`padding_waste`, and reports the exact-ppm delta — a
    measurement, not an assumption (the gain can be ~0 on uniform
    lengths, which is itself the answer).

    Shape: two window sorts under the same shard partitioning and two
    bounded rollups — the corpus is scanned twice (once per ordering);
    at production scale feed it the tiny ``(shard, id, n_tokens)``
    projection, which is what the query layer does.

    Returns ``(shard, fill_arrival_ppm, fill_sorted_ppm, gain_ppm,
    overflow_arrival, overflow_sorted)``.
    """
    arrival = padding_waste(
        pack_contiguous(df, budget, part_col, id_col, tokens_col),
        budget, part_col, tokens_col,
    ).select(
        part_col,
        F.col("fill_ppm").alias("fill_arrival_ppm"),
        F.col("overflow_tokens").alias("overflow_arrival"),
    )
    shortest = padding_waste(
        pack_contiguous(
            df, budget, part_col, id_col, tokens_col,
            order_by=(tokens_col, id_col),
        ),
        budget, part_col, tokens_col,
    ).select(
        part_col,
        F.col("fill_ppm").alias("fill_sorted_ppm"),
        F.col("overflow_tokens").alias("overflow_sorted"),
    )
    return arrival.join(shortest, part_col).select(
        part_col,
        "fill_arrival_ppm",
        "fill_sorted_ppm",
        (F.col("fill_sorted_ppm") - F.col("fill_arrival_ppm"))
        .cast("long")
        .alias("gain_ppm"),
        "overflow_arrival",
        "overflow_sorted",
    )


def ess_report(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "w_ppm",
) -> DataFrame:
    """Effective sample size of a weighted corpus, per group — Kish's
    ``ESS = (Σw)² / Σw²``, the standard answer to "after dedup
    down-weighting / mixture reweighting, how many EFFECTIVE documents
    does each source still contribute?" (a source whose ESS collapses
    to a few hundred dominates gradients with a handful of documents
    however large its row count looks).

    Exact integer arithmetic end-to-end: weights are integer ppm, the
    two sums are DECIMAL(38,0)-widened BEFORE aggregation (Σw² of 10⁹
    ppm-scale weights overflows BIGINT), and the outputs are truncating
    divisions — ``ess_docs = (Σw)² div Σw²`` and the weighting
    efficiency ``ess_ppm = ess_docs·10⁶ div n``.

    One map-side-combinable groupBy; |groups| rows out.

    Returns ``(group, n_docs, sum_w, ess_docs, ess_ppm)``.
    """
    w = F.col(weight_col).cast("decimal(38,0)")
    s = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(w).cast("decimal(38,0)").alias("_sw"),
        F.sum(w * F.col(weight_col)).cast("decimal(38,0)").alias("_sww"),
    )
    return s.select(
        group_col,
        "n_docs",
        F.col("_sw").cast("long").alias("sum_w"),
        F.expr(
            "CAST(_sw * _sw div greatest(_sww, 1) AS BIGINT)"
        ).alias("ess_docs"),
        F.expr(
            "CAST((_sw * _sw div greatest(_sww, 1)) * 1000000"
            " div n_docs AS BIGINT)"
        ).alias("ess_ppm"),
    )
