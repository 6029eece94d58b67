"""Property-based tests (hypothesis) for the deterministic rule core.

These pin the invariants that make the distributed execution safe:
fragmentation-invariance is why section-boundary splitting of giant
documents is exact (SURVEY.md §7.4.4), and offset-permutation invariance
is why shuffle order can never leak into results.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from pdf_extract_spark import rules

WORD = st.from_regex(r"[a-z]{1,8}", fullmatch=True)


@st.composite
def sentences(draw):
    n = draw(st.integers(2, 12))
    ws = [draw(WORD) for _ in range(n)]
    return " ".join(ws).capitalize() + draw(st.sampled_from(".!?"))


@st.composite
def fragmentations(draw):
    """A paragraph of complete sentences plus a random re-fragmentation of
    it at word boundaries."""
    sents = draw(st.lists(sentences(), min_size=1, max_size=5))
    text = " ".join(sents)
    words = text.split(" ")
    cut_points = draw(
        st.lists(st.integers(1, max(len(words) - 1, 1)), max_size=6, unique=True)
    )
    cuts = sorted(p for p in cut_points if p < len(words))
    frags = []
    prev = 0
    for c in cuts + [len(words)]:
        frags.append(" ".join(words[prev:c]))
        prev = c
    return sents, frags


@given(fragmentations())
@settings(max_examples=200, deadline=None)
def test_composition_invariant_to_fragmentation(case):
    """However a paragraph is split at word boundaries, the FSM must
    recompose the same complete sentences (no brackets case)."""
    sents, frags = case
    composed = rules.compose_sentences(frags)
    expected = [s for full in sents for s in rules.split_sentences(full)]
    assert composed == [rules.tighten_brackets(rules.collapse_ws(s)) for s in expected]


@given(st.lists(st.tuples(st.sampled_from(["text", "media"]), sentences()), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_extract_document_invariant_to_offset_permutation(items):
    """Input spans sorted by offset: shuffling the LIST order (keeping the
    offset values) must not change the output."""
    spans = [
        {"kind": k, "text": t if k == "text" else "",
         "media_ref": f"m{i}" if k == "media" else "", "offset": i}
        for i, (k, t) in enumerate(items)
    ]
    out_sorted = rules.extract_document(spans)
    out_reversed = rules.extract_document(list(reversed(spans)))
    assert out_sorted == out_reversed


@given(st.lists(sentences(), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_split_then_join_roundtrip(sents):
    """split_sentences of a joined paragraph finds exactly the sentence
    boundaries (no bracket content)."""
    text = " ".join(sents)
    assert rules.split_sentences(text) == sents


@given(st.text(alphabet=" abc().[]?! \t", max_size=60))
@settings(max_examples=300, deadline=None)
def test_fsm_never_loses_nonspace_characters(t):
    """Composition may re-segment but must never drop non-whitespace
    content (residuals are kept, SURVEY.md §2.8)."""
    out = rules.compose_sentences([t])
    kept = re.sub(r"\s+", "", "".join(out))
    original = re.sub(r"\s+", "", t)
    assert kept == original


@given(st.lists(st.tuples(st.sampled_from(["H1", "H2", "H3", "P", "media"]), WORD), max_size=20))
@settings(max_examples=200, deadline=None)
def test_run_merge_preserves_order_and_nonheaders(frags_in):
    frags = [
        {"kind": k, "text": t, "media_ref": ""} for k, t in frags_in
    ]
    out = rules.merge_consecutive_tags(frags)
    # non-header fragments survive 1:1 in order
    assert [f["text"] for f in out if f["kind"] not in rules.HEADER_KINDS] == [
        f["text"] for f in frags if f["kind"] not in rules.HEADER_KINDS
    ]
    # no two adjacent outputs share a header kind
    for a, b in zip(out, out[1:]):
        assert not (a["kind"] == b["kind"] and a["kind"] in rules.HEADER_KINDS)
    # every input word is present in the output stream
    assert " ".join(f["text"] for f in out).split() == [t for _, t in frags_in]


def test_clean_trigger_fast_path_equivalence():
    """RE_CLEAN_TRIGGER soundness (the vectorized cleanup fast path): any
    string NOT matching the trigger must pass the full cleanup chain
    unchanged except for strip — otherwise the fast path would diverge
    from rules.clean_fragment."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extract_spark import rules

    @settings(max_examples=1500, deadline=None)
    @given(st.text(alphabet=st.characters(), max_size=50))
    def check(t):
        if not rules.RE_CLEAN_TRIGGER.search(t):
            assert rules.clean_fragment(t) == t.strip(), repr(t)
        # and the chain itself is always well-defined
        rules.clean_fragment(t)

    check()


def test_compose_inline_completion_equals_is_complete():
    """The O(1) completion test inlined in compose_sentences (current
    fragment's rstrip tail) must equal rules.is_complete on the joined
    buffer at depth 0 — keeps the documented spec function load-bearing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extract_spark import rules

    frag_st = st.text(
        alphabet=st.sampled_from(list("ab .?!()[]\"'")), min_size=1, max_size=10
    ).map(str.strip).filter(bool)

    @settings(max_examples=2000, deadline=None)
    @given(st.lists(frag_st, min_size=1, max_size=6))
    def check(parts):
        frag = parts[-1]
        fs = frag.rstrip("\"')]")
        inline = bool(fs) and fs[-1] in rules.TERMINALS
        assert inline == rules.is_complete(" ".join(parts), 0), parts

    check()


def test_extract_batch_matches_rules_for_arbitrary_kinds():
    """Kernel/oracle parity must hold for UNEXPECTED kind values too:
    rules.tag_fragments sends only kind=='media' down the media branch —
    any other kind takes the text path, and only kind=='text' counts
    toward boilerplate keys."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_extract_spark import rules
    from pdf_extract_spark.operators.extract import _extract_batch

    span_st = st.fixed_dictionaries({
        "kind": st.sampled_from(["text", "media", "image", "x", ""]),
        # alphabet reaches every tag branch: digits + dots (H1/H2
        # numbering), colon (H3), uppercase (ALLCAPS), terminals,
        # bullets/stars/ws (cleanup chain)
        "text": st.text(
            alphabet=st.sampled_from(list("aB1. :?!*-\t")), max_size=14
        ),
        "media_ref": st.sampled_from(["", "m:1"]),
    })

    @settings(max_examples=400, deadline=None)
    @given(st.lists(st.lists(span_st, max_size=8), min_size=1, max_size=4))
    def check(docs):
        docs = [
            [dict(s, offset=i) for i, s in enumerate(spans)] for spans in docs
        ]
        got = _extract_batch(pd.Series(docs)).tolist()
        exp = [rules.extract_document(spans) for spans in docs]
        assert got == exp, docs

    check()


def test_boilerplate_drop_covers_uncounted_spans():
    """rules.tag_fragments drops ANY non-media span whose collapsed text
    is a boilerplate key — including spans that did NOT count toward the
    keys (unknown kind, or raw length over the cap). Kernel must agree."""
    import pandas as pd

    from pdf_extract_spark import rules
    from pdf_extract_spark.operators.extract import _extract_batch

    hdr = "hdr line"
    docs = [
        # three counted text repeats + an 'image'-kind span with the same
        # text: the image span is dropped by the bp key too
        [
            {"kind": "text", "text": hdr, "media_ref": "", "offset": 0},
            {"kind": "text", "text": hdr, "media_ref": "", "offset": 1},
            {"kind": "text", "text": hdr, "media_ref": "", "offset": 2},
            {"kind": "image", "text": hdr, "media_ref": "", "offset": 3},
            {"kind": "text", "text": "Real sentence.", "media_ref": "", "offset": 4},
        ],
        # an over-cap raw span (100 tabs) collapsing to the key is
        # dropped even though it never counted
        [
            {"kind": "text", "text": hdr, "media_ref": "", "offset": 0},
            {"kind": "text", "text": hdr, "media_ref": "", "offset": 1},
            {"kind": "text", "text": hdr, "media_ref": "", "offset": 2},
            {"kind": "text", "text": hdr + "\t" * 100, "media_ref": "", "offset": 3},
            {"kind": "text", "text": "Kept sentence.", "media_ref": "", "offset": 4},
        ],
    ]
    got = _extract_batch(pd.Series(docs)).tolist()
    exp = [rules.extract_document(spans) for spans in docs]
    assert got == exp
    assert [s["text"] for s in got[0]] == ["Real sentence."]
    assert [s["text"] for s in got[1]] == ["Kept sentence."]
