"""Structured Streaming ingest tests: availableNow drain, checkpoint
resume (new files only), and equality with the batch extraction path."""

import os

from pyspark.sql import functions as F

from poc_document_ocr_spark.operators.extraction import extract_turns
from poc_document_ocr_spark.schema import TRANSCRIPT_SCHEMA
from poc_document_ocr_spark.sources.catalog import Catalog
from poc_document_ocr_spark.sources.datagen import generate
from poc_document_ocr_spark.streaming.ingest import (
    stream_extract,
    stream_extract_to_catalog,
)


def _write_wave(spark, path, n_convs, seed):
    data = generate(n_convs=n_convs, median_turns=5, seed=seed, skew=False)
    df = spark.createDataFrame(data.turns, TRANSCRIPT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)
    return df.count()


def _rows(spark, path):
    return {
        (r.conv_id, r.turn_idx, r.extracted_text)
        for r in spark.read.parquet(path).collect()
    }


def test_stream_extract_drain_and_resume(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    n1 = _write_wave(spark, src, n_convs=6, seed=11)
    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = _rows(spark, out)
    assert len(got1) == n1

    # streamed extraction ≡ batch extraction over the same input
    batch = {
        (r.conv_id, r.turn_idx, r.extracted_text)
        for r in extract_turns(spark.read.parquet(src)).collect()
    }
    assert got1 == batch

    # second wave: the checkpoint must skip wave-1 files
    n2 = _write_wave(spark, src, n_convs=3, seed=22)
    q2 = stream_extract(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = _rows(spark, out)
    assert len(got2) == n1 + n2
    assert got1 <= got2


def test_stream_extract_foreach_batch_catalog(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_wave(spark, src, n_convs=4, seed=33)
    cat = Catalog(spark, str(tmp_path / "wh"))
    q = stream_extract_to_catalog(
        spark, cat, src, "extracted_stream",
        str(tmp_path / "ckpt2"), run_id="run-S",
    )
    q.awaitTermination(120)
    got = cat.read("extracted_stream")
    assert got.filter(F.col("run_id") == "run-S").count() == got.count()
    assert got.count() == spark.read.parquet(src).count()
    assert "batch_id" in got.columns
    # re-run with the same checkpoint: nothing new to process
    q2 = stream_extract_to_catalog(
        spark, cat, src, "extracted_stream",
        str(tmp_path / "ckpt2"), run_id="run-S",
    )
    q2.awaitTermination(120)
    assert cat.read("extracted_stream").count() == got.count()


def _stage_events(spark, tmp_path):
    """Stage the single-file events table as a directory (the file stream
    source requires a directory path)."""
    src = str(tmp_path / "events_src")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    return src


def test_streaming_windowed_counts_match_batch_closed_windows(spark, tmp_path):
    """availableNow drain: every window the watermark finalized must equal
    the batch aggregation; later windows are withheld, not wrong."""
    from poc_document_ocr_spark.streaming.windows import (
        streaming_windowed_counts,
    )

    src = _stage_events(spark, tmp_path)
    events_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(events_schema).parquet(src)
    out = str(tmp_path / "win_out")
    q = (
        streaming_windowed_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    assert got, "no finalized windows emitted"

    batch = spark.read.parquet(src)
    expect = {
        (r.window_start, r.event_type): r.n_events
        for r in (
            batch.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
            )
        ).collect()
    }
    for k, v in got.items():
        assert expect[k] == v, k
    # windows beyond the final watermark are the only ones missing
    missing = set(expect) - set(got)
    max_emitted = max(k[0] for k in got)
    assert all(k[0] > max_emitted for k in missing)


def test_streaming_sessionize_closed_sessions(spark, tmp_path):
    """Stateful applyInPandasWithState sessions: closed sessions from a
    single-batch drain equal the batch sessionization minus each user's
    open tail session."""
    from poc_document_ocr_spark.operators.events import sessionize_events
    from poc_document_ocr_spark.streaming.windows import streaming_sessionize
    from pyspark.sql import Window as W

    src = _stage_events(spark, tmp_path)
    events_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(events_schema).parquet(src)
    out = str(tmp_path / "sess_out")
    q = (
        streaming_sessionize(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.read.parquet(out).collect()
    }

    batch = sessionize_events(spark.read.parquet(src), gap_minutes=30)
    w = W.partitionBy("user_id")
    closed = batch.withColumn(
        "last_sess", F.max("session_id").over(w)
    ).filter(F.col("session_id") < F.col("last_sess"))
    # compare with microsecond-parsed timestamps (the batch operator emits
    # formatted strings, the stateful operator real timestamps)
    import datetime as dt

    def parse(s):
        return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")

    got_norm = {(u, str(parse(a)), str(parse(b)), n) for u, a, b, n in got}
    exp_norm = {
        (r.user_id, str(parse(r.session_start)), str(parse(r.session_end)),
         r.n_events)
        for r in closed.collect()
    }
    assert got_norm == exp_norm and len(got_norm) > 0


def test_stream_static_enrich_left_join_passthrough(spark, tmp_path):
    from poc_document_ocr_spark.streaming.windows import stream_static_enrich

    src = str(tmp_path / "enrich_src")
    spark.createDataFrame(
        [(1, 10, "click"), (2, 20, "view"), (3, 99, "click")],
        "event_id long, user_id long, event_type string",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string"
    ).parquet(src)
    dim = spark.createDataFrame(
        [(10, "AUTO"), (20, "HOUSE")], "user_id long, segment string"
    )
    out = str(tmp_path / "enrich_out")
    q = (
        stream_static_enrich(stream, dim, "user_id", ("segment",))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["event_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["segment"] == "AUTO"
    assert rows[2]["segment"] == "HOUSE"
    # unmatched stream row passes through with null (left join, no state)
    assert rows[3]["segment"] is None
    assert len(rows) == 3


def test_streaming_interval_join_time_bound(spark, tmp_path):
    from poc_document_ocr_spark.streaming.windows import (
        streaming_interval_join,
    )

    schema = "event_id long, user_id long, ts timestamp"
    base = "2024-01-01 00:00:00"
    clicks_src = str(tmp_path / "clicks_src")
    views_src = str(tmp_path / "views_src")
    spark.createDataFrame(
        [(1, 7, base)], "event_id long, user_id long, ts string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) ts").write.parquet(clicks_src)
    spark.createDataFrame(
        [
            (10, 7, "2024-01-01 00:30:00"),   # in window
            (11, 7, "2024-01-01 01:30:00"),   # past the 1h bound
            (12, 8, "2024-01-01 00:10:00"),   # other user
            (13, 7, "2023-12-31 23:50:00"),   # before the click
        ],
        "event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) ts").write.parquet(views_src)

    joined = streaming_interval_join(
        spark.readStream.schema(schema).parquet(clicks_src),
        spark.readStream.schema(schema).parquet(views_src),
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("view_id"),
    )
    out = str(tmp_path / "ssj_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert [(r["click_id"], r["view_id"]) for r in rows] == [(1, 10)]


def test_streaming_sessions_restart_from_checkpoint_and_flush(
    spark, tmp_path
):
    """Kill/restart e2e for the stateful sessionizer: drain wave 1, stop
    the query (simulated kill — availableNow terminates and nothing holds
    the state but the checkpoint), land wave 2, restart from the SAME
    checkpoint and drain again, then flush the open tails from the state
    store. closed₁ ∪ closed₂ ∪ flush must equal the batch sessionization
    of ALL events — sessions spanning the kill boundary must be stitched
    by the restored state, not split or double-emitted."""
    import datetime as dt

    from poc_document_ocr_spark.operators.events import sessionize_events
    from poc_document_ocr_spark.streaming.windows import (
        read_open_sessions,
        streaming_sessionize,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # split by a GLOBAL time threshold so each user's wave-2 events are all
    # later than its wave-1 events (the per-user non-decreasing arrival
    # contract a continuously running job gets from its watermark)
    cut = events.selectExpr(
        "percentile_approx(CAST(ts AS TIMESTAMP), 0.5) p"
    ).collect()[0]["p"]
    src = str(tmp_path / "restart_src")
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")
    tscol = F.col("ts").cast("timestamp")
    events.filter(tscol <= F.lit(cut)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = events.schema

    def drain():
        q = (
            streaming_sessionize(
                spark.readStream.schema(schema).parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()  # wave 1, then the query is gone (kill point)
    n_closed_1 = spark.read.parquet(out).count()

    events.filter(tscol > F.lit(cut)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()  # restart from the same checkpoint: must resume, not reprocess
    closed = spark.read.parquet(out)
    assert closed.count() > n_closed_1
    flush = read_open_sessions(spark, ckpt)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed.unionByName(flush).collect()
    }

    def parse(s):
        return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")

    expect = {
        (r.user_id, parse(r.session_start), parse(r.session_end), r.n_events)
        for r in sessionize_events(events, gap_minutes=30).collect()
    }
    assert got == expect and len(got) > 0


def test_stream_consolidate_incremental_equals_batch(spark, tmp_path):
    """Incremental consolidation (key-scoped bucket re-fold per micro-
    batch): two waves splitting every conversation, one batch per file;
    final records table equals the batch fold, and re-running the drained
    stream from its checkpoint changes nothing (idempotent maintenance)."""
    from poc_document_ocr_spark.operators.extraction import extract_turns
    from poc_document_ocr_spark.plans.pipeline import consolidate_stage
    from poc_document_ocr_spark.schema import TRANSCRIPT_SCHEMA
    from poc_document_ocr_spark.sources.catalog import Catalog
    from poc_document_ocr_spark.sources.datagen import generate
    from poc_document_ocr_spark.streaming.ingest import (
        stream_consolidate_to_catalog,
    )

    data = generate(n_convs=10, median_turns=6, seed=5, skew=False)
    turns = spark.createDataFrame(data.turns, TRANSCRIPT_SCHEMA)
    src = str(tmp_path / "in")
    for parity in (0, 1):
        turns.filter(F.col("turn_idx") % 2 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    cat = Catalog(spark, str(tmp_path / "wh"))

    def drain():
        q = stream_consolidate_to_catalog(
            spark, cat, src, "ex_s", "rec_s", str(tmp_path / "ck"),
            run_id="r1", max_files=1, buckets=4,
        )
        q.awaitTermination(300)

    drain()
    got = cat.read("rec_s").drop("bucket")
    expect = consolidate_stage(extract_turns(spark.read.parquet(src)))
    assert got.columns == expect.columns
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0

    snap = sorted(repr(tuple(r)) for r in got.collect())
    drain()  # same checkpoint: no new files -> nothing may change
    again = sorted(
        repr(tuple(r)) for r in cat.read("rec_s").drop("bucket").collect()
    )
    assert again == snap


def test_consolidate_sink_crash_mid_batch_then_replay_converges(
    spark, tmp_path
):
    """At-least-once contract of the incremental consolidation sink: a
    batch that crashes AFTER landing its extracted turns but BEFORE the
    records overwrite is replayed by the engine with the same batch_id —
    the replay must converge to exactly the clean-run state (no duplicate
    extracted rows, records complete), because both writes are dynamic
    partition overwrites of deterministic content."""
    from poc_document_ocr_spark.operators.extraction import extract_turns
    from poc_document_ocr_spark.plans.pipeline import consolidate_stage
    from poc_document_ocr_spark.schema import TRANSCRIPT_SCHEMA
    from poc_document_ocr_spark.sources.catalog import Catalog
    from poc_document_ocr_spark.sources.datagen import generate
    from poc_document_ocr_spark.streaming.ingest import (
        consolidate_batch_sink,
    )

    data = generate(n_convs=8, median_turns=5, seed=9, skew=False)
    turns = spark.createDataFrame(data.turns, TRANSCRIPT_SCHEMA)
    batch = extract_turns(turns).localCheckpoint()
    cat = Catalog(spark, str(tmp_path / "wh"))

    class CrashAfterExtracted:
        """Catalog proxy that dies on the SECOND write of a batch (the
        records overwrite), simulating an executor/driver loss mid-sink."""

        def __init__(self, inner):
            self.inner, self.writes = inner, 0

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def overwrite_partitions(self, df, name, part_col):
            self.writes += 1
            if self.writes == 2:
                raise RuntimeError("injected crash before records write")
            self.inner.overwrite_partitions(df, name, part_col)

    faulty = CrashAfterExtracted(cat)
    try:
        consolidate_batch_sink(faulty, batch, 0, "ex", "rec", "r1", buckets=4)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    # extracted turns landed, records table missing — the torn state
    assert cat.exists("ex") and not cat.exists("rec")

    # the engine replays the SAME batch_id against the real catalog
    consolidate_batch_sink(cat, batch, 0, "ex", "rec", "r1", buckets=4)
    # no duplicated extracted rows from the pre-crash write
    assert cat.read("ex").count() == batch.count()
    got = cat.read("rec").drop("bucket")
    expect = consolidate_stage(batch)
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_consolidate_sink_reingest_under_new_run_id_does_not_double_count(
    spark, tmp_path
):
    """Review finding: a job restarted with a FRESH checkpoint re-lands the
    same turns under a new run_id; the bucket re-fold must first-wins dedup
    at turn grain or every re-ingested turn double-counts in the records."""
    from poc_document_ocr_spark.operators.extraction import extract_turns
    from poc_document_ocr_spark.plans.pipeline import consolidate_stage
    from poc_document_ocr_spark.schema import TRANSCRIPT_SCHEMA
    from poc_document_ocr_spark.sources.catalog import Catalog
    from poc_document_ocr_spark.sources.datagen import generate
    from poc_document_ocr_spark.streaming.ingest import (
        consolidate_batch_sink,
    )

    data = generate(n_convs=6, median_turns=5, seed=3, skew=False)
    turns = spark.createDataFrame(data.turns, TRANSCRIPT_SCHEMA)
    batch = extract_turns(turns).localCheckpoint()
    cat = Catalog(spark, str(tmp_path / "wh"))

    consolidate_batch_sink(cat, batch, 0, "ex", "rec", "runA", buckets=4)
    # fresh checkpoint: batch numbering restarts, same input, new run id
    consolidate_batch_sink(cat, batch, 0, "ex", "rec", "runB", buckets=4)

    # both copies are retained in the extracted table (lineage)...
    assert cat.read("ex").count() == 2 * batch.count()
    # ...but the records fold counts each turn exactly once
    got = cat.read("rec").drop("bucket")
    expect = consolidate_stage(batch)
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_streaming_state_plateau_soak(spark):
    """Continuous-trigger soak (VERDICT r4 task #7): the state-store
    boundedness claims, previously proven only by construction, measured
    on a live processing-time run over the rate source.

    * ``streaming_dedup_keys`` with UNIQUE keys (value is monotonic, so
      without eviction state grows linearly with input forever): state
      must EVICT with the watermark — final state ≪ total input — and
      PLATEAU (late-run state stops growing); a 4× larger watermark
      horizon must hold proportionally more state (eviction is actually
      tied to the horizon, not an artifact).
    * ``streaming_sessionize`` with recycling users: state is per-ACTIVE-
      USER, not per-event — numRowsTotal pinned to the user cardinality
      while thousands of events flow through.

    Gated by SPARK_GRAFT_SKIP_SOAK=1 for quick local iterations; runs in
    the default suite (~2.5 min).
    """
    import time

    import pytest as _pytest

    if os.environ.get("SPARK_GRAFT_SKIP_SOAK"):
        _pytest.skip("SPARK_GRAFT_SKIP_SOAK set")

    from poc_document_ocr_spark.streaming.windows import (
        streaming_dedup_keys,
        streaming_sessionize,
    )

    import tempfile

    def soak(out_df, dur_s):
        ckpt = tempfile.mkdtemp(prefix="soak_ckpt_")
        q = (
            out_df.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        samples = []  # (elapsed_s, state_rows) per *new* batch
        seen = set()
        t0 = time.time()
        try:
            while time.time() - t0 < dur_s:
                time.sleep(2)
                p = q.lastProgress
                if not p or not p.get("stateOperators"):
                    continue
                if p["batchId"] in seen:
                    continue
                seen.add(p["batchId"])
                samples.append(
                    (time.time() - t0,
                     p["stateOperators"][0]["numRowsTotal"])
                )
            total_in = sum(
                pr["numInputRows"]
                for pr in q.recentProgress
                if pr.get("numInputRows")
            )
        finally:
            q.stop()
        return samples, total_in

    def rate(rps):
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rps)
            .load()
        )

    def dedup_run(horizon_s, dur_s):
        ev = rate(200).select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("user_id"),  # unique forever
            F.concat(F.lit("e"), F.col("value") % 5).alias("event_type"),
        )
        out = streaming_dedup_keys(
            ev, keys=("user_id", "event_type"),
            watermark=f"{horizon_s} seconds",
        )
        return soak(out, dur_s)

    # --- dedup, short horizon --------------------------------------------
    s_small, in_small = dedup_run(horizon_s=5, dur_s=40)
    assert len(s_small) >= 5, s_small
    final_small = s_small[-1][1]
    # eviction happened: unique keys, so no-eviction state == total input
    assert final_small < 0.7 * in_small, (final_small, in_small)
    # plateau: past the ramp (first 60% of wall), state stops growing
    late = [v for t, v in s_small if t > 0.6 * s_small[-1][0]]
    mid = [v for t, v in s_small if 0.3 * s_small[-1][0] < t <= 0.6 * s_small[-1][0]]
    assert late and mid
    assert max(late) <= 1.5 * max(mid), (max(late), max(mid))

    # --- dedup, 4x horizon: proportionally more state, still bounded ------
    s_big, in_big = dedup_run(horizon_s=20, dur_s=90)
    final_big = s_big[-1][1]
    assert final_big < 0.7 * in_big, (final_big, in_big)
    assert final_small < 0.7 * final_big, (final_small, final_big)

    # --- sessions: state rows pinned to ACTIVE USERS, not events ----------
    ev = rate(200).select(
        (F.col("value") % 17).alias("user_id"),
        F.col("timestamp").alias("ts"),
    )
    s_sess, in_sess = soak(streaming_sessionize(ev, gap_minutes=30), 25)
    assert s_sess and in_sess > 1000, (s_sess, in_sess)
    assert max(v for _, v in s_sess) <= 17, s_sess
    assert s_sess[-1][1] == 17, s_sess
