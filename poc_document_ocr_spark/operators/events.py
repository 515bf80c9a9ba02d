"""Event-time operators over an append-only event log.

The reference's only time semantics are wall-clock stamps on operations
(``Operation.cs:9``); a web-scale engine additionally needs event-time
bucketing and sessionization for telemetry/training-signal tables. Both are
pure built-in expressions:

* :func:`windowed_event_stats` — tumbling-window aggregation
  (``F.window``), JSON property extraction (``get_json_object``),
  distinct-user counts. Batch form of the Structured Streaming windowed
  aggregation in ``streaming/windows.py`` (same groupBy, plus watermark).
* :func:`sessionize_events` — idle-gap sessionization: the same
  gaps-and-islands window pattern as the identifier run-grouping
  (``aggregation.with_runs``), keyed on time deltas instead of identifier
  changes. One (user_id, ts) sort-shuffle, then a doc-grain groupBy.

Scale notes: windows/sessions shuffle on (key, time-bucket); AQE handles
hot users; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "windowed_event_stats",
    "sessionize_events",
    "sliding_event_counts",
    "trending_event_types",
    "value_histogram",
    "asof_join",
    "interval_join",
    "event_funnel",
]


def sliding_event_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """SLIDING-window counts per event type: each event lands in
    ``window/slide`` overlapping windows (``F.window`` with a slide
    duration — the hopping-window shape dashboards use for smoothed
    rates, vs the partitioning tumbling windows of
    :func:`windowed_event_stats`). One shuffle on (window, type); the
    window replication factor is the constant ``window/slide``, applied
    map-side."""
    return (
        events.groupBy(
            F.window("ts", window, slide).alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


def trending_event_types(
    events: DataFrame, window: str = "1 hour", k: int = 3
) -> DataFrame:
    """Top-k event types per tumbling window by count (the "trending"
    listing): counts first (map-side combine), then a rank window over
    the per-(window, type) aggregate — the rank input is already
    aggregate-sized, and Spark's WindowGroupLimit prunes beyond-k rows
    before the rank's exchange. Deterministic: ties break by type name."""
    counts = events.groupBy(
        F.window("ts", window).alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    rank_w = W.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rank_w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "rnk",
        )
    )


def value_histogram(
    events: DataFrame, value_col: str = "value", bin_width: float = 5.0
) -> DataFrame:
    """Fixed-width histogram of a numeric column: bin index, edges, count,
    and integer ppm share — the profiling pass a pipeline runs before
    choosing clipping/normalization constants. ``floor(value / width)``
    is a single IEEE division (cross-engine exact); one groupBy(bin) with
    map-side combine, then the tiny bin table crossed with the 1-row
    total for shares."""
    b = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    bins = (
        events.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = bins.agg(F.sum("n").alias("_tot"))
    return (
        bins.crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.col("bin") * bin_width).alias("lo"),
            ((F.col("bin") + 1) * bin_width).alias("hi"),
            "n",
            F.expr("n * 1000000 div _tot").alias("n_ppm"),
        )
    )


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-type stats: counts, distinct users, value
    min/max, and the sum of the integer ``k`` property parsed out of the
    JSON ``props`` column (map-side JSON path, no UDF)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("k").alias("sum_k"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "n_users",
            "min_value",
            "max_value",
            "sum_k",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    payload: tuple[str, ...] = ("ref_value",),
) -> DataFrame:
    """As-of join: attach to every ``left`` row the LATEST ``right`` row
    with ``right.ts <= left.ts`` for the same key (the time-series lookup
    Spark has no built-in for; DuckDB/kdb call it ASOF JOIN).

    Implemented as the scale shape, not a nested-loop: union both sides
    tagged, ONE sort-shuffle on (key, ts), and a forward-fill
    (``last(ignorenulls)``) of the right payload struct down to each left
    row. Cost is a single Exchange + window regardless of how many right
    rows precede a left row — never a per-row range scan, never
    BroadcastNestedLoop (the trap shape Spark picks for a raw
    ``ts <= ts`` join condition).

    A right row at exactly ``left.ts`` matches (``<=``: the side tag sorts
    right-before-left at equal stamps). Right rows should be unique per
    (key, ts) — with duplicates, which one wins is engine-dependent in any
    asof implementation; pre-aggregate first. Left rows before any right
    row get null payload. Output: all ``left`` columns + ``asof_ts`` +
    payload columns.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    ltype = StructType(left.schema.fields)
    rtype = StructType(
        [StructField("asof_ts", right.schema[ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )
    l_tag = left.select(
        F.col(key),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(rtype).alias("_r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        F.lit(None).cast(ltype).alias("_l"),
        F.struct(
            F.col(ts).alias("asof_ts"), *[F.col(c) for c in payload]
        ).alias("_r"),
    )
    w = W.partitionBy(key).orderBy("_t", "_is_l").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    filled = (
        l_tag.unionByName(r_tag)
        .withColumn("_ref", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_l") == 1)
    )
    return filled.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        F.col("_ref.asof_ts").alias("asof_ts"),
        *[F.col("_ref")[c].alias(c) for c in payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_minutes: int = 60,
) -> DataFrame:
    """Range (interval) join: every ``points`` row paired with every
    ``intervals`` row of the same key whose ``[start, end]`` contains its
    timestamp.

    A raw ``BETWEEN`` join condition gives Spark only the key equi-part
    and the range as a post-filter — fine — but with NO key (or a hot key)
    it degenerates to a nested loop over everything. The scale shape used
    here: explode each interval over the time buckets it covers, bucket
    each point (map-side), and join EQUI on (key, bucket) with the exact
    range check as a residual filter. Each (point, interval) pair meets in
    exactly one bucket (the point's), so no dedup pass is needed; shuffle
    volume is O(points + interval-bucket spans), never O(points ×
    intervals). ``bucket_minutes`` trades explode factor against join
    selectivity — set it near the typical interval length.

    Output: all ``points`` columns + all non-key ``intervals`` columns.
    """
    bucket_us = bucket_minutes * 60 * 1_000_000

    def b(col):
        return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / bucket_us)

    pb = points.withColumn("_bucket", b(ts))
    spans = F.sequence(b(start), b(end))
    ib = intervals.withColumn("_bucket", F.explode(spans))
    icols = [c for c in intervals.columns if c != key]
    joined = pb.join(ib, [key, "_bucket"]).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    )
    return joined.select(*points.columns, *icols)


def sessionize_events(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Idle-gap sessions per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Returns one row per session
    with start/end, event count, and min/max value.

    Deterministic under ties: ordering is (ts, event_id).
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (no sub-second truncation ambiguity); the cast
    # handles TIMESTAMP_NTZ parquet columns (identity under the UTC session)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    boundary = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    cume = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_sess = events.withColumn(
        "session_id", F.sum(boundary).over(cume).cast("int")
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each prefix of ``steps``, how many
    users performed those steps IN ORDER (each step strictly after the
    previous one's first qualifying occurrence — the unbounded-window
    funnel every product-analytics engine ships, here as the batch twin
    a transcript pipeline uses to measure agent-flow completion:
    request → tool call → resolution).

    Semantics: ``t₁`` = the user's first ``steps[0]`` event; ``tᵢ`` =
    the first ``steps[i]`` event with ``ts > tᵢ₋₁``. A user reaches
    step *i* iff ``tᵢ`` exists. First-occurrence chaining is the
    standard greedy rule and is ORDER-OPTIMAL (earliest feasible
    anchor never excludes a later completion), so the count per step
    is exact, not heuristic.

    Shape at 10⁹ users: one filter+groupBy per step plus one equi-join
    per step transition, every one keyed on ``user_col`` — the hash
    partitioning is REUSED across the chain (no re-keying), AQE picks
    join strategies, nothing is broadcast (every side is
    user-cardinality). Per-step counts are single-row aggregates
    unioned into the N-row result, and the conversion ratios are
    integral divisions of exact BIGINTs computed over that N-row
    table with a single-partition window — bounded by len(steps),
    never by the corpus.

    Returns ``(step_idx, step_name, n_users, conv_from_prev_ppm,
    conv_from_first_ppm)`` — one row per step.
    """
    counts = []
    reached = None
    for i, step in enumerate(steps):
        hits = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if reached is None:
            reached = hits.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            reached = (
                hits.join(
                    reached.select("_u", F.col("_t").alias("_tp")), "_u"
                )
                .filter(F.col("_ts") > F.col("_tp"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        counts.append(
            reached.agg(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(step).alias("step_name"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select(
        "step_idx",
        "step_name",
        "n_users",
        F.expr(
            "CAST(CAST(n_users AS DECIMAL(38,0)) * 1000000 div greatest("
            "lag(n_users, 1, n_users) OVER (ORDER BY step_idx), 1)"
            " AS BIGINT)"
        ).alias("conv_from_prev_ppm"),
        F.expr(
            "CAST(CAST(n_users AS DECIMAL(38,0)) * 1000000 div greatest("
            "first_value(n_users) OVER (ORDER BY step_idx), 1) AS BIGINT)"
        ).alias("conv_from_first_ppm"),
    )
