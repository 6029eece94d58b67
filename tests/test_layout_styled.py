"""Styled-layout path golden test: raw_blocks fixtures through the Spark
layout_extract operator must match the pure-Python oracle exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark import generator, oracle
from pdf_extract_spark.operators.layout import layout_extract
from pdf_extract_spark.schemas import RAW_BLOCKS

N_DOCS = 20
SEED = 17


def test_layout_extract_matches_oracle(spark):
    rows = [r for d in range(N_DOCS) for r in generator.make_raw_blocks_doc(d, seed=SEED)]
    blocks = spark.createDataFrame(rows, schema=RAW_BLOCKS)
    pages = blocks.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("page", "page_w", "page_h", "lines"))
        ).alias("pages")
    )
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in layout_extract(pages).collect()
    }
    assert len(got) == N_DOCS
    for d in range(N_DOCS):
        pgs = generator.make_raw_blocks_doc(d, seed=SEED)
        doc_id = pgs[0]["doc_id"]
        exp = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.expected_spans_from_layout(
                [{k: p[k] for k in ("page", "page_w", "page_h", "lines")} for p in pgs]
            )
        ]
        assert got[doc_id] == exp, f"doc {doc_id}"


def test_two_column_reading_order(spark):
    """A hand-built two-column page: right-column lines must come after all
    left-column lines regardless of y interleave (W3, layout_analyzer.py:57-66)."""

    def line(text, x, y):
        return {"text": text, "size": 10.0, "flags": 0, "font": "F1", "color": 0,
                "block_type": 0, "media_ref": "",
                "bbox": {"x0": x, "y0": y, "x1": x + 100.0, "y1": y + 12.0}}

    pages = [{
        "page": 1, "page_w": 595.0, "page_h": 842.0,
        "lines": [
            line("Right one.", 400.0, 100.0),
            line("Left two.", 60.0, 200.0),
            line("Left one.", 60.0, 100.0),
            line("Right two.", 400.0, 200.0),
        ],
    }]
    out = oracle.expected_spans_from_layout(pages)
    assert [s["text"] for s in out] == ["Left one.", "Left two.", "Right one.", "Right two."]
