"""rank_correlation: exact milli rho at the +1/-1 poles, midrank tie
handling, NULL exclusion, and the n < 2 guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import textstats


def _sig(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, a long, b long")


def _rho(spark, rows):
    out = textstats.rank_correlation(_sig(spark, rows), "a", "b").collect()
    assert len(out) == 1
    return out[0]


def test_perfect_agreement_is_1000(spark):
    r = _rho(spark, [(i, i * 10, i * 3 + 7) for i in range(8)])
    assert r["n_docs"] == 8 and r["rho_milli"] == 1000


def test_perfect_inversion_is_minus_1000(spark):
    r = _rho(spark, [(i, i, 100 - i) for i in range(9)])
    assert r["n_docs"] == 9 and r["rho_milli"] == -1000


def test_midranks_for_ties(spark):
    """a = (1,2,2,4) -> midranks (1, 2.5, 2.5, 4); b = (1,2,3,4) tie-
    free. d = (0, .5, -.5, 0), sum d^2 = 0.5, rho = 1 - 6*0.5/(4*15)
    = 0.95 -> doubled-rank kernel: S' = 2, rho_milli =
    1000 - 3000*2 DIV (2*4*15) = 950."""
    r = _rho(spark, [(0, 1, 1), (1, 2, 2), (2, 2, 3), (3, 4, 4)])
    assert r["n_docs"] == 4 and r["rho_milli"] == 950


def test_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (2, None, 3), (3, 4, None)],
        "doc_id long, a long, b long",
    )
    r = textstats.rank_correlation(df, "a", "b").collect()[0]
    assert r["n_docs"] == 2 and r["rho_milli"] == 1000


def test_fewer_than_two_rows_null_rho(spark):
    r = _rho(spark, [(0, 5, 5)])
    assert r["n_docs"] == 1 and r["rho_milli"] is None
    r = textstats.rank_correlation(
        _sig(spark, []).limit(0), "a", "b"
    ).collect()[0]
    assert r["n_docs"] == 0 and r["rho_milli"] is None


def test_constant_signal_all_tied(spark):
    """A constant signal ties every row into one midrank (r2a = n+1 =
    6 for all); b tie-free (r2b = 2,4,6,8,10). d = (4,2,0,-2,-4),
    S' = 40, rho_milli = 1000 - 3000*40 DIV (2*5*24) = 500 — the
    difference formula's known midrank behavior, asserted exactly (the
    DuckDB twin pins the same number). The point: no crash, and no
    per-row window for the degenerate hot value."""
    r = _rho(spark, [(i, 7, i) for i in range(5)])
    assert r["n_docs"] == 5 and r["rho_milli"] == 500


def test_plan_no_per_row_window_no_python(spark):
    """Both windows run over the bounded value HISTOGRAMS (each fed by
    a HashAggregate), never the corpus rows: no row_number anywhere,
    and exactly two single-partition exchanges (one per signal's
    histogram running total)."""
    sig = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 23).alias("a"),
        (F.col("id") % 7).alias("b"),
    )
    q = textstats.rank_correlation(sig, "a", "b")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan
    assert plan.count("Exchange SinglePartition") <= 3  # 2 histograms + final scalar agg
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
