"""Multimodal binary-column tests: magic sniffing, frame chunking edges,
and the mapInPandas decode plumbing (batch shape, determinism)."""

import hashlib

from pyspark.sql import functions as F

from poc_document_ocr_spark.operators.multimodal import (
    chunk_frames,
    decode_media_features,
    media_meta,
    sniff_format,
)


def _payloads(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, hexdata string")
    return df.select("doc_id", F.unhex("hexdata").alias("payload"))


def test_sniff_format_magics(spark):
    rows = [
        (0, "89504E470D0A1A0A" + "00" * 4),         # png
        (1, "FFD8FFE0" + "00" * 8),                  # jpeg
        (2, "52494646" + "AABBCCDD" + "57415645"),   # RIFF....WAVE
        (3, "52494646" + "AABBCCDD" + "41564920"),   # RIFF but AVI → bin
        (4, "68656C6C6F"),                            # 'hello' → bin
    ]
    got = {
        r.doc_id: r.fmt
        for r in _payloads(spark, rows)
        .select("doc_id", sniff_format(F.col("payload")).alias("fmt"))
        .collect()
    }
    assert got == {0: "png", 1: "jpeg", 2: "wav", 3: "bin", 4: "bin"}


def test_media_meta_fields(spark):
    payload = bytes(range(16))
    df = _payloads(spark, [(1, payload.hex())])
    m = df.select(media_meta(F.col("payload")).alias("m")).collect()[0].m
    assert m.n_bytes == 16
    assert m.head_hex == payload[:8].hex().upper()
    assert m.content_md5 == hashlib.md5(payload.hex().upper().encode()).hexdigest()


def test_chunk_frames_sizes_and_last_short(spark):
    # 10 bytes at frame_bytes=4 → frames of 4, 4, 2
    df = _payloads(spark, [(1, "00" * 10)])
    rows = sorted(
        (r.frame_no, r.frame_bytes)
        for r in chunk_frames(df, frame_bytes=4).collect()
    )
    assert rows == [(0, 4), (1, 4), (2, 2)]


def test_chunk_frames_empty_payload_single_empty_frame(spark):
    df = spark.createDataFrame([(1,)], "doc_id long").select(
        "doc_id", F.unhex(F.lit("")).alias("payload")
    )
    rows = chunk_frames(df, frame_bytes=4).collect()
    assert [(r.frame_no, r.frame_bytes) for r in rows] == [(0, 0)]


def test_chunk_frames_roundtrip_bytes(spark):
    payload = bytes(range(256)) * 3  # 768 bytes
    df = _payloads(spark, [(1, payload.hex())])
    rows = sorted(
        (r.frame_no, bytes(r.frame))
        for r in chunk_frames(df, frame_bytes=100).collect()
    )
    assert b"".join(f for _, f in rows) == payload
    assert len(rows) == 8


def test_decode_media_features_batchwise(spark):
    # deterministic byte stats independent of partitioning
    rows = [(i, bytes([i % 7] * (i + 1)).hex()) for i in range(20)]
    df = _payloads(spark, rows)
    out = {
        r.doc_id: (r.n_bytes, r.byte_sum, r.byte_mean, r.decoder)
        for r in decode_media_features(df).collect()
    }
    for i in range(20):
        n, s = i + 1, (i % 7) * (i + 1)
        assert out[i] == (n, s, s / n, "bytestats")
    # partitioning must not change results
    out4 = {
        r.doc_id: (r.n_bytes, r.byte_sum)
        for r in decode_media_features(df.repartition(4)).collect()
    }
    assert out4 == {k: v[:2] for k, v in out.items()}
    # no codec in this environment → dimensions are null for every row
    assert all(
        r.width is None and r.height is None
        for r in decode_media_features(df).collect()
    )


def test_decode_media_features_with_injected_codec(spark):
    """The real-decode path through a PIL-compatible codec: decodable
    payloads get width/height + decoder='pil'; a payload the codec rejects
    falls back to byte stats PER ROW (one corrupt payload never poisons its
    Arrow batch)."""

    class _FakeImg:
        def __init__(self, size):
            self.size = size

    class _FakeCodec:
        # PIL.Image-compatible surface: open(file_like) -> obj with .size
        @staticmethod
        def open(f):
            data = f.read()
            if not data.startswith(b"\x89PNG"):
                raise ValueError("cannot identify image file")
            return _FakeImg((len(data), len(data) * 2))

    rows = [
        (0, (b"\x89PNG\r\n\x1a\n" + b"\x01" * 8).hex()),  # decodable, 16 B
        (1, b"garbage-bytes".hex()),                        # codec rejects
    ]
    got = {
        r.doc_id: r
        for r in decode_media_features(
            _payloads(spark, rows), codec=_FakeCodec
        ).collect()
    }
    assert (got[0].width, got[0].height, got[0].decoder) == (16, 32, "pil")
    assert (got[1].width, got[1].height, got[1].decoder) == (
        None, None, "bytestats",
    )
    # byte stats are computed for every row either way
    assert got[0].n_bytes == 16 and got[1].n_bytes == len(b"garbage-bytes")
