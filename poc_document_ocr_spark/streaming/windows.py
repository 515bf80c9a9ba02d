"""Streaming event-time operators: watermarked windows and stateful
sessions.

* :func:`streaming_windowed_counts` — the streaming twin of
  ``operators.events.windowed_event_stats``: tumbling windows over event
  time with a watermark bounding state and handling late data; append mode
  emits a window only once the watermark passes its end (no retractions
  downstream).
* :func:`streaming_sessionize` — custom stateful operator via
  ``applyInPandasWithState``: per-user idle-gap sessions carried across
  micro-batches in explicit state; closed sessions are emitted, the open
  tail stays in state. Within a batch events are sorted by event time;
  across batches correctness assumes per-user non-decreasing event-time
  arrival (the ``availableNow`` backlog-drain mode used in tests satisfies
  this with a single batch; a continuously running job pairs this with a
  watermark to bound reordering, as the tests document).

Both keep all per-key work in Arrow-batched pandas; state is a compact
(start, last, n) triple per user — millions of users fit in the state
store, and the store shards by the groupBy key across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

__all__ = [
    "streaming_windowed_counts",
    "streaming_sessionize",
    "streaming_dedup_keys",
    "streaming_totals_to_dir",
    "stream_static_enrich",
    "streaming_interval_join",
    "read_open_sessions",
]


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join: match each left-stream event to
    the right-stream events of the same key that occur within ``window``
    AFTER it (the attribution pattern — click → conversions within the
    hour). The hardest streaming op class: BOTH sides buffer state, and
    the watermark + the time-bound condition are what let Spark evict it
    — without the bound the state grows forever, so the bound is part of
    the operator's contract, not an optimization.

    Inner-join emissions do not wait for the watermark (they fire as soon
    as both rows exist), so an ``availableNow`` drain of bounded input
    yields exactly the batch join within the same bound — the oracle
    bridge. State per key is O(events in the window), watermark-evicted.
    """
    l = left.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    ).alias("l")
    r = right.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    ).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND r.ts >= l.ts"
            f" AND r.ts < l.ts + interval {window}"
        ),
    )


def stream_static_enrich(
    stream_df: DataFrame,
    dim_df: DataFrame,
    key: str,
    dim_cols: tuple[str, ...],
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to every
    streaming row — the lookup-table pattern (user → segment, doc →
    source metadata) every production ingest runs before routing/metrics.

    The static side is re-planned per micro-batch (Spark re-resolves the
    batch DataFrame each trigger, so a refreshed dimension table is picked
    up without restarting the stream), and a stream-static LEFT join is
    append-safe with NO watermark — unmatched stream rows pass through
    with nulls instead of blocking on state. At scale the dimension side
    should be broadcast-sized or pre-bucketed on the key; the join itself
    involves no streaming state at all.
    """
    dim = dim_df.select(key, *dim_cols)
    return stream_df.join(dim, key, "left")


def streaming_windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type (append-mode
    safe: only finalized windows are emitted)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


def streaming_dedup_keys(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on a key tuple: emit each key the FIRST time
    it is seen, drop every later arrival — the incremental-ingest twin of
    the batch duplicate-skip anti-join (an arriving record whose key is
    already in the output is skipped).

    State boundedness: plain ``dropDuplicates(keys)`` does NOT evict key
    state when the event-time column is absent from the dedup subset — the
    state store grows with the distinct-key count forever (round-3 ADVICE
    finding). ``dropDuplicatesWithinWatermark`` is the purpose-built fix:
    each key's state carries its event time and is evicted once the
    watermark passes it, so a duplicate arriving within the watermark
    delay of the first occurrence is dropped and state stays bounded by
    the keys seen per watermark horizon. Emitting ONLY the key columns
    keeps the result deterministic (which physical row arrives first for
    a key is a race; the key set is not).
    """
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(*keys, "ts")
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )


def streaming_totals_to_dir(
    events: DataFrame, out_dir: str, key: str = "event_type"
) -> None:
    """Complete-mode running totals per key, maintained in a parquet dir.

    The streaming agg keeps the full running count per key; every
    micro-batch the sink OVERWRITES the output directory with the new
    totals (complete mode re-emits every row, so overwrite — the
    idempotent-republish pattern; parquet file sinks cannot take complete
    mode directly, hence foreachBatch). After an ``availableNow`` drain
    the directory holds exactly the batch ``groupBy(key).count()`` of the
    backlog. Blocks until the drain finishes.
    """
    totals = events.groupBy(key).agg(F.count(F.lit(1)).alias("n_events"))

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = (
        totals.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()


def read_open_sessions(spark, checkpoint_dir: str) -> DataFrame:
    """Drain-end flush of the OPEN session tails left in the state store.

    :func:`streaming_sessionize` emits a session only when a later event
    closes it, so after an ``availableNow`` drain each user's final session
    is still sitting in state — correct for a continuously running job
    (the next batch may extend it), but a *finished* backlog drain wants
    those tails flushed. Rather than invent a sentinel-event convention,
    this reads the checkpoint's state store directly with Spark's state
    data source (``format("statestore")``): one batch scan over the latest
    committed state version, sharded by the store's own partitioning — no
    stream restart, no state mutation, safe to run after (or even while)
    the query is stopped.

    Returns the open tails shaped exactly like the emitted rows
    ``(user_id, session_start, session_end, n_events)`` so
    ``closed ∪ flush`` equals the batch sessionization of the whole input
    — the invariant the restart e2e test and the ``streaming_flush``
    oracle query pin.
    """
    st = spark.read.format("statestore").load(checkpoint_dir)
    gs = F.col("value.groupState")
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.timestamp_micros(gs["start"]).alias("session_start"),
        F.timestamp_micros(gs["last"]).alias("session_end"),
        gs["n"].alias("n_events"),
    )


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-user idle-gap sessionization with explicit cross-batch state.

    Emits one row per CLOSED session (a later event arrived beyond the
    gap); the most recent open session stays in the state store until a
    subsequent batch closes it. The streaming counterpart of
    ``operators.events.sessionize_events``.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events int"
    )
    state_schema = "start long, last long, n int"

    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        stamps: list[int] = []
        for pdf in pdfs:
            stamps.extend(int(v.value) // 1000 for v in pd.to_datetime(pdf["ts"]))
        stamps.sort()

        closed = []
        for t in stamps:
            if last is not None and t - last > gap_us:
                closed.append((start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            n += 1
            last = t
        if last is not None:
            state.update((int(start), int(last), int(n)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
