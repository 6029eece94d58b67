"""Golden oracle — pure-Python expected outputs for span-equality tests.

Runs the deterministic rule core (rules.py) on plain Python documents,
with no Spark involved; pipeline tests assert that the distributed
execution produces byte-identical span sequences
``(kind, text, media_ref, order)`` per document (BASELINE.json invariant).
"""

from __future__ import annotations

from pdf_extract_spark import rules


def expected_spans(doc: dict) -> list[dict]:
    """Expected output spans for one input_hint-shaped document."""
    return rules.extract_document(doc["spans"])


def expected_spans_from_layout(pages: list[dict]) -> list[dict]:
    """Expected output spans for one styled layout document (raw_blocks)."""
    return rules.compose_fragments(rules.layout_document(pages))


def expected_corpus(docs: list[dict]) -> dict[str, list[tuple]]:
    """doc_id -> ordered (kind, text, media_ref, offset) tuples."""
    return {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in expected_spans(d)
        ]
        for d in docs
    }
