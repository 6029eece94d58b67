"""filter_kappa: exact milli kappa at the +1/-1 poles, a hand-computed
mixed table, the pe=1 vacuous-agreement NULL, NULL-verdict exclusion,
empty input, and the map-only plan pin."""

from __future__ import annotations

from pdf_extract_spark.operators import textstats


def _gates(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, a boolean, b boolean")


def _kappa(spark, rows):
    out = textstats.filter_kappa(_gates(spark, rows), "a", "b").collect()
    assert len(out) == 1
    return out[0]


def test_identical_nonconstant_gates_kappa_1000(spark):
    r = _kappa(spark, [(0, True, True), (1, True, True), (2, False, False)])
    assert r["n_docs"] == 3 and r["n_agree"] == 3
    assert r["milli_po"] == 1000
    assert r["kappa_milli"] == 1000


def test_perfect_disagreement_balanced_marginals_is_minus_1000(spark):
    """a = (T,T,F,F), b = (F,F,T,T): po = 0, pe = 1/2, kappa = -1 —
    exercises the negative sign-split branch exactly."""
    r = _kappa(
        spark,
        [(0, True, False), (1, True, False), (2, False, True), (3, False, True)],
    )
    assert r["n_agree"] == 0 and r["milli_po"] == 0
    assert r["milli_pe"] == 500
    assert r["kappa_milli"] == -1000


def test_hand_computed_mixed_table(spark):
    """n=5: (T,T) x2, (T,F), (F,T), (F,F). n11=2, n00=1, r1=3, c1=3,
    S = 9 + 4 = 13; po = 3000 DIV 5 = 600; pe = 13000 DIV 25 = 520;
    kappa = (5*3 - 13)*1000 DIV (25 - 13) = 2000 DIV 12 = 166."""
    r = _kappa(
        spark,
        [
            (0, True, True),
            (1, True, True),
            (2, True, False),
            (3, False, True),
            (4, False, False),
        ],
    )
    assert r["n_docs"] == 5 and r["n_agree"] == 3
    assert r["milli_po"] == 600 and r["milli_pe"] == 520
    assert r["kappa_milli"] == 166


def test_constant_identical_gates_vacuous_null(spark):
    """Both gates keep everything: po = pe = 1, den = 0 -> kappa NULL
    (agreement is vacuous), po/pe still reported."""
    r = _kappa(spark, [(i, True, True) for i in range(4)])
    assert r["milli_po"] == 1000 and r["milli_pe"] == 1000
    assert r["kappa_milli"] is None


def test_null_verdicts_excluded(spark):
    r = _kappa(
        spark,
        [(0, True, True), (1, None, True), (2, False, None), (3, False, False)],
    )
    assert r["n_docs"] == 2 and r["n_agree"] == 2
    assert r["kappa_milli"] == 1000


def test_empty_input(spark):
    r = _kappa(spark, [])
    assert r["n_docs"] == 0 and r["n_agree"] == 0
    assert r["milli_po"] is None and r["milli_pe"] is None
    assert r["kappa_milli"] is None


def test_plan_map_only_single_aggregate(spark):
    """One global five-counter aggregate: the only Exchange is the
    final SinglePartition fold; no window, no Python."""
    import pyspark.sql.functions as F

    g = spark.range(0, 4096).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3 == 0).alias("a"),
        (F.col("id") % 5 == 0).alias("b"),
    )
    q = textstats.filter_kappa(g, "a", "b")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Window" not in plan
    n_exchange = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_exchange == 1, plan
    assert "Exchange SinglePartition" in plan
