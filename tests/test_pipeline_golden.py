"""Golden span-sequence equality: Spark pipeline vs pure-Python oracle.

The BASELINE.json invariant: per-document span-sequence equality on
(kind, text, media_ref, order)."""

from __future__ import annotations

from pdf_extract_spark import generator, oracle
from pdf_extract_spark.pipeline import run_extraction
from pdf_extract_spark.schemas import DOCUMENTS

N_DOCS = 80
SEED = 42


def _collect_spans(df) -> dict[str, list[tuple]]:
    rows = df.collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }


def test_span_sequence_equality(spark):
    docs = generator.make_corpus(N_DOCS, seed=SEED)
    golden = oracle.expected_corpus(docs)

    df = spark.createDataFrame(docs, schema=DOCUMENTS)
    got = _collect_spans(run_extraction(df, num_partitions=8))

    assert set(got) == set(golden)
    for doc_id in golden:
        assert got[doc_id] == golden[doc_id], f"span mismatch in {doc_id}"


def test_giant_document_equality(spark):
    # force-inspect at least one giant (>= 2000 spans) for skew-path parity
    docs = generator.make_corpus(200, seed=7)
    giants = [d for d in docs if len(d["spans"]) >= 2000]
    assert giants, "generator must produce giants at 5% rate"
    subset = giants[:2]
    golden = oracle.expected_corpus(subset)
    df = spark.createDataFrame(subset, schema=DOCUMENTS)
    got = _collect_spans(run_extraction(df, num_partitions=4))
    assert got == golden


def test_empty_and_media_only_documents(spark):
    docs = [
        {"doc_id": "d_empty", "spans": []},
        {"doc_id": "d_media", "spans": [
            {"kind": "media", "text": "", "media_ref": "m:d_media:1", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "m:d_media:2", "offset": 1},
        ]},
        {"doc_id": "d_blank", "spans": [
            {"kind": "text", "text": "   ", "media_ref": "", "offset": 0},
        ]},
    ]
    golden = oracle.expected_corpus(docs)
    df = spark.createDataFrame(docs, schema=DOCUMENTS)
    got = _collect_spans(run_extraction(df))
    assert got == golden
    assert got["d_media"] == [("media", "", "m:d_media:1", 0), ("media", "", "m:d_media:2", 1)]
    assert got["d_empty"] == []
    assert got["d_blank"] == []
