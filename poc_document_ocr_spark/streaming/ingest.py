"""Incremental ingest as Structured Streaming.

The reference's queue trigger (``PdfProcessorFunction.cs:54-57``) delivers
at-least-once batch dispatch; its idempotency comes from overwrite-true
writes and the duplicate-skip anti-join, not from stream state (SURVEY
§2.9). The streaming rebuild keeps that shape honest:

* **Extraction streams.** Per-turn extraction is stateless and turn-local,
  so it runs safely under any micro-batch boundary: new transcript files →
  the same Arrow-batched pandas UDF → append sink, with the checkpoint
  giving exactly-once file tracking. This is the expensive stage, and the
  one worth running incrementally at 100 TB/day arrival rates.
* **Consolidation stays batch.** The fold is conversation-grain; a
  micro-batch boundary can split a conversation, so per-batch folding
  would silently produce partial documents. Run ``plans.pipeline`` over the
  streamed extracted table on demand (the duplicate-skip anti-join makes
  re-folds idempotent) — the same lambda shape the reference has
  (queue-driven OCR, on-demand aggregation reads).

``Trigger(availableNow=True)`` drains everything present then stops — the
"process the backlog as one resumable job" mode used by the tests; drop it
for a continuously running ingest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.extraction import extract_turns
from ..schema import TRANSCRIPT_SCHEMA

__all__ = ["stream_extract", "stream_extract_to_catalog"]


def _source(spark: SparkSession, input_path: str, max_files: int | None):
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files is not None:
        # bound per-micro-batch work so one giant backlog file drop cannot
        # produce an unboundedly large batch (cluster-size-independent knob)
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    return reader.parquet(input_path)


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    max_files: int | None = None,
) -> StreamingQuery:
    """File-source stream → per-turn extraction → parquet append sink.

    The checkpoint tracks processed input files: a restart resumes with
    already-extracted files skipped (the streaming analog of the lineage
    anti-join resume in ``plans.pipeline``).
    """
    extracted = extract_turns(_source(spark, input_path, max_files))
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_to_catalog(
    spark: SparkSession,
    catalog,
    input_path: str,
    extracted_table: str,
    checkpoint_path: str,
    run_id: str,
    available_now: bool = True,
    max_files: int | None = None,
) -> StreamingQuery:
    """foreachBatch variant: per-batch write through the Catalog with the
    run-correlation stamp (reference: ``cosmosEntity.OperationId``), for
    sinks the file sink can't express (Iceberg MERGE, lineage rows).

    foreachBatch delivery is at-least-once: a micro-batch that fails after a
    partial write but before the checkpoint commit is REPLAYED with the same
    ``batch_id``. The sink is made idempotent by giving each batch its own
    ``run_id=<r>/batch_id=<k>`` partition written with dynamic partition
    overwrite — a replay replaces the partial partition instead of appending
    duplicates (Iceberg analog: ``overwritePartitions()``; same shape as the
    reference's overwrite-true blob writes, SURVEY §2.9). Partitioning on
    ``(run_id, batch_id)`` rather than ``batch_id`` alone matters: a later
    run started with a FRESH checkpoint restarts batch numbering at 0, and a
    batch_id-only layout would silently overwrite the earlier run's
    partitions in the same table (round-3 ADVICE finding)."""
    extracted = extract_turns(_source(spark, input_path, max_files))

    def sink(batch_df, batch_id: int) -> None:
        catalog.overwrite_partitions(
            batch_df.withColumn("run_id", F.lit(run_id)).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ),
            extracted_table,
            part_col=("run_id", "batch_id"),
        )

    writer = (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
