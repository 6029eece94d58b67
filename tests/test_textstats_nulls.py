"""repetition_stats edge semantics: NULL text must yield NULL for ALL
three stats (not a mixed NULL/0.0 row), and degenerate token arrays must
not turn into runtime slice errors."""

from __future__ import annotations

from pdf_extract_spark.operators import textstats


def test_repetition_stats_null_and_degenerate(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "one"), (2, "a a b a b")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}

    null_row = rows[0]
    assert null_row["n_tokens"] is None
    assert null_row["type_token_ratio"] is None
    assert null_row["top_bigram_frac"] is None  # was 0.0 pre-fix

    one = rows[1]  # single token: no bigrams -> 0.0, not NULL/error
    assert one["n_tokens"] == 1
    assert one["type_token_ratio"] == 1.0
    assert one["top_bigram_frac"] == 0.0

    rep = rows[2]  # bigrams: [a a, a b, b a, a b] -> top 'a b' 2/4
    assert rep["n_tokens"] == 5
    assert rep["type_token_ratio"] == 0.4
    assert rep["top_bigram_frac"] == 0.5
