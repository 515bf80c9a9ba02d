"""JSONL/CSV ingestion: schema enforcement, corrupt-row quarantine,
round-trip fidelity (the interchange formats a training-data pipeline
actually receives)."""

from __future__ import annotations

import json
import os

import pytest

from poc_document_ocr_spark.sources.textio import (
    read_csv,
    read_jsonl,
    split_quarantine,
    write_jsonl,
)

SCHEMA = "doc_id long, text string, lang string"


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "alpha", "lang": "en"},
        {"doc_id": 2, "text": "beta é", "lang": "fr"},
    ]
    lines = [json.dumps(r) for r in rows]
    lines.insert(1, '{"doc_id": "NOT A NUMBER", "text": }')  # malformed
    (src / "part-0.jsonl").write_text("\n".join(lines), encoding="utf-8")

    df = read_jsonl(spark, str(src), SCHEMA)
    good, bad = split_quarantine(df)
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in good.collect()}
    assert got == {1: ("alpha", "en"), 2: ("beta é", "fr")}
    quarantined = [r["raw_line"] for r in bad.collect()]
    assert quarantined == ['{"doc_id": "NOT A NUMBER", "text": }']

    # round-trip: write the good side, read it back, byte-equal rows
    out = str(tmp_path / "out")
    write_jsonl(good, out)
    back = read_jsonl(spark, out, SCHEMA)
    good2, bad2 = split_quarantine(back)
    assert bad2.count() == 0
    assert {
        r["doc_id"]: (r["text"], r["lang"]) for r in good2.collect()
    } == got


def test_csv_quarantine(spark, tmp_path):
    src = tmp_path / "csv"
    src.mkdir()
    (src / "d.csv").write_text(
        "doc_id,text,lang\n1,hello,en\nnot_a_number,broken,xx\n2,world,de\n"
    )
    df = read_csv(spark, str(src), SCHEMA)
    good, bad = split_quarantine(df)
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    assert got == {1: "hello", 2: "world"}
    assert bad.count() == 1
