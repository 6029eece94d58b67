"""token_drift: exact milli TV at the identity/disjoint poles, a
hand-computed mixed case, empty-side NULL guards, NULL-text rows, and
the scale-shape plan pin (no Python, no cartesian corpus join)."""

from __future__ import annotations

from pdf_extract_spark import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _drift(spark, rows_a, rows_b):
    out = curation.token_drift(
        _docs(spark, rows_a), _docs(spark, rows_b)
    ).collect()
    assert len(out) == 1
    return out[0]


def test_identical_corpora_tv_zero(spark):
    rows = [(0, "alpha beta gamma"), (1, "beta beta delta")]
    r = _drift(spark, rows, rows)
    assert r["milli_tv"] == 0
    assert r["vocab_a"] == r["vocab_b"] == r["vocab_shared"] == 4
    assert r["n_tokens_a"] == r["n_tokens_b"] == 6


def test_disjoint_vocabularies_tv_1000(spark):
    r = _drift(spark, [(0, "aa bb aa")], [(0, "cc dd"), (1, "ee")])
    assert r["milli_tv"] == 1000
    assert r["vocab_shared"] == 0
    assert r["vocab_a"] == 2 and r["vocab_b"] == 3


def test_hand_computed_mixed_case(spark):
    """A = 'x x y' (x:2, y:1; N=3), B = 'x y y y' (x:1, y:3; N=4).
    sum |c_a*N_b - c_b*N_a| = |8-3| + |4-9| = 10;
    milli_tv = 10*1000 DIV (2*3*4) = 416 (exact TV = 5/12)."""
    r = _drift(spark, [(0, "x x y")], [(0, "x y y y")])
    assert r["milli_tv"] == 416
    assert r["n_tokens_a"] == 3 and r["n_tokens_b"] == 4
    assert r["vocab_shared"] == 2


def test_empty_side_null_tv(spark):
    r = _drift(spark, [(0, "alpha beta")], [])
    assert r["n_tokens_b"] == 0 and r["vocab_b"] == 0
    assert r["milli_tv"] is None
    both = _drift(spark, [], [])
    assert both["n_tokens_a"] == 0 and both["n_tokens_b"] == 0
    assert both["milli_tv"] is None


def test_null_and_whitespace_text_contribute_nothing(spark):
    r = _drift(
        spark,
        [(0, "tok tok"), (1, None), (2, "   ")],
        [(0, "tok tok")],
    )
    assert r["n_tokens_a"] == r["n_tokens_b"] == 2
    assert r["milli_tv"] == 0


def test_plan_no_python_no_cartesian_corpus_join(spark):
    """The token join is key-equi (full outer on tok); the only
    nested-loop joins are the two broadcast single-row total folds.
    Nothing evaluates in Python."""
    import pyspark.sql.functions as F

    a = spark.range(0, 512).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 37).cast("string")).alias("text"),
    )
    b = spark.range(0, 512).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 23).cast("string")).alias("text"),
    )
    q = curation.token_drift(a, b)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan
