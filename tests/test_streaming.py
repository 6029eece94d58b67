"""Incremental (availableNow) extraction: exactly-once over arriving
files, outputs equal to the batch oracle."""

from __future__ import annotations

from pdf_extract_spark import generator, oracle
from pdf_extract_spark.schemas import DOCUMENTS
from pdf_extract_spark.streaming import incremental_extraction


def _collect(spark, path):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in spark.read.parquet(path).collect()
    }


def test_incremental_extraction_exactly_once(spark, tmp_path):
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    batch1 = generator.make_corpus(20, seed=31)
    spark.createDataFrame(batch1, schema=DOCUMENTS).write.mode("append").parquet(inp)
    q = incremental_extraction(spark, inp, outp, ckpt)
    q.awaitTermination(120)
    got1 = _collect(spark, outp)
    assert got1 == oracle.expected_corpus(batch1)

    # second wave of files: only the NEW documents flow through
    batch2 = [generator.make_document(i, seed=31) for i in range(20, 32)]
    spark.createDataFrame(batch2, schema=DOCUMENTS).write.mode("append").parquet(inp)
    q2 = incremental_extraction(spark, inp, outp, ckpt)
    q2.awaitTermination(120)
    got2 = _collect(spark, outp)

    assert len(got2) == 32  # no duplicates from re-reading batch1 files
    assert got2 == oracle.expected_corpus(batch1 + batch2)
