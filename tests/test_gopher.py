"""gopher_repetition: hand-computed exactness on a tiny frame, the
NULL/empty edge semantics, and the zero-Exchange map-only plan contract
(the scale-defining property — the naive gram explode+groupBy would
shuffle ~9x the tokenised corpus)."""

from __future__ import annotations

from pdf_extract_spark.operators import textstats

SF = "/root/testdata/sf0.001"


def test_gopher_hand_computed(spark):
    # tokens: aa bb aa bb cc dd; n_chars = 17 (two newlines included)
    df = spark.createDataFrame(
        [(1, "aa bb\naa bb\ncc dd")], "doc_id long, text string"
    )
    row = textstats.gopher_repetition(df).collect()[0]
    # lines: 'aa bb' x2 + 'cc dd' -> one beyond-first occurrence
    assert row.n_lines == 3
    assert row.dup_line_milli == 1000 // 3
    assert row.dup_line_char_milli == 5 * 1000 // 17
    # bigrams: 'aa bb' x2 (10 chars), 'bb aa', 'bb cc', 'cc dd' x1
    assert row.top2_char_milli == 10 * 1000 // 17
    # trigrams all distinct -> top3 = one 8-char gram
    assert row.top3_char_milli == 8 * 1000 // 17
    # both 5-grams distinct -> no duplicated-gram coverage
    assert row.dup5_char_milli == 0
    # only one 6-gram -> a single run of length 1
    assert row.dup6_char_milli == 0


def test_gopher_dup_can_exceed_1000(spark):
    # 'x y' * 6: every 5-gram occurs more than once, so duplicated-gram
    # char coverage (counting every occurrence) exceeds the text length
    # - documented operator semantics (callers threshold, not sum).
    df = spark.createDataFrame(
        [(1, "x y x y x y x y x y x y")], "doc_id long, text string"
    )
    row = textstats.gopher_repetition(df).collect()[0]
    assert row.dup5_char_milli > 1000


def test_gopher_null_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "\n\n")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in textstats.gopher_repetition(df).collect()}
    # NULL text -> every stat NULL
    assert all(
        v is None for k, v in rows[1].asDict().items() if k != "doc_id"
    )
    # empty text -> zero lines, zero-denominator stats NULL
    assert rows[2].n_lines == 0
    assert rows[2].dup_line_milli is None
    assert rows[2].dup_line_char_milli is None
    # newline-only text -> no non-empty lines, but n_chars > 0 so the
    # char-denominator stats are defined (and zero)
    assert rows[3].n_lines == 0
    assert rows[3].dup_line_milli is None
    assert rows[3].dup_line_char_milli == 0
    assert rows[3].top2_char_milli == 0


def test_gopher_plan_map_only(spark):
    """The kernel must plan ZERO Exchange and zero Python eval — each
    document's signals come from sorting its own arrays, never from a
    corpus-wide gram shuffle."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        textstats.gopher_repetition(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_gopher_gate_thresholds(spark):
    # A clean doc must be LONG: on a one-sentence doc the top bigram
    # necessarily covers >20% of chars (the paper's thresholds assume
    # page-length text). 120 distinct two-letter words -> top2 ~ 14 milli.
    import itertools, string
    clean = " ".join(
        a + b
        for a, b in itertools.islice(
            itertools.product(string.ascii_lowercase, repeat=2), 120
        )
    )
    df = spark.createDataFrame(
        [
            (1, "x y x y x y x y x y x y"),     # phrase loop: many violations
            (2, clean),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.gopher_gate(df).collect()}
    assert not rows[1].keep and rows[1].n_violations > 0
    assert rows[2].keep and rows[2].n_violations == 0
    # NULL text: NULL signals threshold to zero violations -> keep
    assert rows[3].keep and rows[3].n_violations == 0


def test_gopher_gate_plan_map_only(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        textstats.gopher_gate(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
