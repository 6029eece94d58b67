"""The 'table' source_type heuristic (reference contract main.py:316-338:
source_type ∈ {table,image,text}, there assigned per sentence by the LLM;
here re-derived from bbox grid geometry — SURVEY.md §2.8).

Covers each gate of rules.detect_table_lines, the byte path end-to-end
(pdfgen grid page -> parser -> layout -> kind='table' spans), and the
downstream consumer (remove_numbering's 'table' context)."""

from __future__ import annotations

from pdf_extract_spark import rules
from pdf_extract_spark.sources import pdfgen, pdfparse


def _line(x, y, block_type=0):
    return {"block_type": block_type, "text": "w", "size": 10.0, "flags": 0,
            "color": 0, "media_ref": "",
            "bbox": {"x0": x, "y0": y, "x1": x + 50.0, "y1": y + 12.0}}


def _grid(n_cols, n_rows, pitch=30.0, x_step=80.0):
    return [_line(60.0 + x_step * c, 100.0 + pitch * r)
            for r in range(n_rows) for c in range(n_cols)]


def test_true_grid_flagged():
    lines = _grid(3, 3)
    assert rules.detect_table_lines(lines) == [True] * 9


def test_two_columns_rejected():
    """A 2-column grid is indistinguishable from a two-column body layout
    — the min-cols gate rejects it (precision over recall, documented at
    rules.TABLE_MIN_COLS)."""
    lines = _grid(2, 4)
    assert rules.detect_table_lines(lines) == [False] * 8


def test_scattered_rows_rejected():
    """3 recurring columns but 60pt row pitch: chance alignments in a
    column layout look like this; the adjacency gate rejects them."""
    lines = _grid(3, 3, pitch=60.0)
    assert rules.detect_table_lines(lines) == [False] * 9


def test_single_column_rejected():
    lines = [_line(60.0, 100.0 + 25.0 * i) for i in range(8)]
    assert rules.detect_table_lines(lines) == [False] * 8


def test_partial_last_row_not_flagged():
    """A trailing row holding fewer than TABLE_MIN_COLS grid columns is
    not a candidate row; its cells stay unflagged."""
    lines = _grid(3, 3) + [_line(60.0, 190.0), _line(140.0, 190.0)]
    flags = rules.detect_table_lines(lines)
    assert flags[:9] == [True] * 9
    assert flags[9:] == [False, False]


def test_media_lines_never_cells():
    lines = _grid(3, 3)
    lines[4] = _line(60.0 + 80.0, 130.0, block_type=1)
    flags = rules.detect_table_lines(lines)
    assert flags[4] is False


def test_two_separated_grids_both_flagged():
    """Two vertically separated grids are independent adjacency runs;
    both survive."""
    lines = _grid(3, 2) + [_line(60.0 + 80.0 * c, 500.0 + 30.0 * r)
                           for r in range(2) for c in range(3)]
    assert rules.detect_table_lines(lines) == [True] * 12


def test_byte_path_grid_page_classified():
    """build_pdf(with_table=True) appends a deterministic 3x3 grid page;
    the full byte path must emit exactly 9 kind='table' spans in
    row-major reading order, and the rng-driven pages are untouched."""
    for d in (0, 3, 11):
        pdf = pdfgen.build_pdf(d, with_table=True)
        pages = pdfparse.parse_pdf(pdf)
        assert pages == pdfgen.expected_pages(d, with_table=True)
        spans = rules.compose_fragments(rules.layout_document(pages))
        cells = [s["text"] for s in spans if s["kind"] == "table"]
        assert cells == [f"cell r{r} c{c} d{d}" for r in range(3) for c in range(3)]
        # the non-table prefix is identical to the doc without the grid page
        base = rules.compose_fragments(
            rules.layout_document(pdfparse.parse_pdf(pdfgen.build_pdf(d))))
        got_prefix = [(s["kind"], s["text"]) for s in spans if s["kind"] != "table"]
        assert got_prefix == [(s["kind"], s["text"]) for s in base]


def test_no_spurious_tables_without_grid():
    """Two-column body pages (x0 ∈ {60, 320} with synchronized column
    tops) must never be classified as tables."""
    for d in range(60):
        frags = rules.layout_document(pdfparse.parse_pdf(pdfgen.build_pdf(d)))
        assert not any(f["kind"] == "table" for f in frags), f"doc {d}"


def test_table_context_consumer():
    """The taxonomy feeds remove_numbering's 'table' context
    (rules.py: C7): a leading bare number is DATA in a table cell and
    must survive; in text context it is numbering and is stripped."""
    assert rules.remove_numbering("12. widgets", context="table") == "12. widgets"
    assert rules.remove_numbering("12. widgets", context="text") == "widgets"
