"""Property-based tests for the PDF writer/parser pair."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_extract_spark.sources import pdfgen, pdfparse


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
@settings(max_examples=300, deadline=None)
def test_string_escape_roundtrip(t):
    """_esc -> lexer -> _unescape is the identity for printable ASCII
    (including parens and backslashes)."""
    encoded = f"({pdfgen._esc(t)})".encode("latin-1")
    lex = pdfparse._Lexer(encoded)
    tok = lex.next_token()
    assert pdfparse._unescape(tok[1:-1]) == t


@given(st.integers(0, 500), st.integers(1, 2**30))
@settings(max_examples=30, deadline=None)
def test_build_parse_roundtrip_any_seed(doc_index, seed):
    """Writer/parser parity holds for arbitrary doc indices and seeds."""
    data = pdfgen.build_pdf(doc_index, seed=seed)
    assert data[:5] == b"%PDF-"
    assert pdfparse.parse_pdf(data) == pdfgen.expected_pages(doc_index, seed=seed)


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_parser_rejects_arbitrary_bytes(blob):
    """Garbage never parses silently: either the magic check or the xref
    walk raises PdfError (no crashes with other exception types)."""
    if blob.startswith(b"%PDF-"):
        return
    try:
        pdfparse.parse_pdf(blob)
        raise AssertionError("garbage parsed as PDF")
    except pdfparse.PdfError:
        pass


def test_octal_escape():
    lex = pdfparse._Lexer(rb"(a\101b\12)")
    tok = lex.next_token()
    assert pdfparse._unescape(tok[1:-1]) == "aAb\n"


@given(
    st.integers(min_value=0, max_value=9),
    st.lists(st.tuples(st.integers(min_value=9, max_value=4000),
                       st.integers(min_value=0, max_value=255)),
             min_size=1, max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_byte_flips_never_escape_pdferror(doc_index, flips):
    """parse_pdf's contract: ANY corrupt input raises PdfError — byte
    flips in a valid PDF must never surface ValueError/KeyError/
    zlib.error etc. (those would fail a Spark task through the
    quarantining UDF's single except clause)."""
    data = bytearray(pdfgen.build_pdf(doc_index, seed=21))
    for pos, val in flips:
        data[pos % len(data)] = val
    try:
        pdfparse.parse_pdf(bytes(data))
    except pdfparse.PdfError:
        pass  # quarantined — the only acceptable failure type


VARIANTS = ("classic", "incremental", "multigen", "objstm", "objstm2", "hybrid")


@given(
    st.sampled_from(VARIANTS),
    st.integers(0, 200),
    st.integers(1, 2**30),
)
@settings(max_examples=60, deadline=None)
def test_every_layout_variant_roundtrips(variant, doc_index, seed):
    """The odd-PDF long tail a crawl hits: multi-generation /Prev chains
    (a file saved incrementally 3 times), hybrid-reference files
    (classic table + /XRefStm hop), and objects split ACROSS two object
    streams — all must parse to the identical page structure as the
    classic layout."""
    data = pdfgen.build_pdf(doc_index, seed=seed, variant=variant)
    assert pdfparse.parse_pdf(data) == pdfgen.expected_pages(doc_index, seed=seed)


@given(
    st.sampled_from(VARIANTS),
    st.integers(min_value=0, max_value=9),
    st.lists(st.tuples(st.integers(min_value=9, max_value=4000),
                       st.integers(min_value=0, max_value=255)),
             min_size=1, max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_byte_flips_quarantine_all_variants(variant, doc_index, flips):
    """The PdfError-only contract must hold across EVERY file layout —
    corrupting an ObjStm header, a /Prev offset, an /XRefStm pointer or
    a W-encoded binary entry quarantines, never crashes."""
    data = bytearray(pdfgen.build_pdf(doc_index, seed=21, variant=variant))
    for pos, val in flips:
        data[pos % len(data)] = val
    try:
        pdfparse.parse_pdf(bytes(data))
    except pdfparse.PdfError:
        pass  # quarantined — the only acceptable failure type


def test_multigen_has_chained_prev_sections():
    """Structural: the multigen layout really contains 4 xref sections
    with 3 /Prev links (not collapsed into one)."""
    data = pdfgen.build_pdf(3, seed=21, variant="multigen")
    assert data.count(b"startxref") == 4
    assert data.count(b"/Prev") == 3


def test_hybrid_has_xrefstm_hop():
    """Structural: the hybrid layout carries a classic table whose
    trailer points at a /Type /XRef stream via /XRefStm."""
    data = pdfgen.build_pdf(3, seed=21, variant="hybrid")
    assert b"/XRefStm" in data
    assert b"xref\n0 1\n" in data          # the classic table
    assert b"/Type /XRef" in data          # the stream it hops to


def test_objstm2_splits_across_streams():
    data = pdfgen.build_pdf(3, seed=21, variant="objstm2")
    assert data.count(b"/Type /ObjStm") == 2
