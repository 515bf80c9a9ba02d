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
