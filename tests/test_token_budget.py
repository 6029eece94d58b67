"""token_budget_select: greedy prefix under an exact token budget via
the bounded score-histogram decomposition — verdict parity with the
naive global-window rule, boundary-bucket exactness, NULL/zero-token
edges, degenerate budgets, and the scale-shaped plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import textstats


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, milli_bits_per_token long, n_tokens long"
    )


def _naive(rows, budget):
    """The oracle rule, in Python: global (score, key) order, keep while
    the running token total stays within budget."""
    elig = sorted(
        (r for r in rows if r[1] is not None and r[2] > 0),
        key=lambda r: (r[1], r[0]),
    )
    kept, cum = set(), 0
    for k, _, t in elig:
        cum += t
        if cum <= budget:
            kept.add(k)
    return {r[0]: r[0] in kept for r in rows}


def _collect(spark, rows, budget):
    out = textstats.token_budget_select(_scored(spark, rows), budget)
    return {r["doc_id"]: r["kept"] for r in out.collect()}


def test_budget_prefix_matches_naive_rule(spark):
    rows = [
        (0, 100, 10), (1, 100, 10), (2, 50, 5), (3, 200, 100),
        (4, 150, 30), (5, 50, 20), (6, None, 10), (7, 100, 0),
    ]
    for budget in (0, 4, 5, 24, 25, 45, 46, 64, 65, 174, 175, 1000):
        assert _collect(spark, rows, budget) == _naive(rows, budget), budget


def test_boundary_bucket_key_order_tiebreak(spark):
    """Within the one straddling score bucket, lower keys win — the
    within-bucket running sum is ordered by key."""
    rows = [(i, 100, 10) for i in range(10)]
    got = _collect(spark, rows, 35)
    assert got == {i: i < 3 for i in range(10)}


def test_ineligible_rows_never_kept_and_do_not_consume(spark):
    rows = [(0, None, 50), (1, 10, 0), (2, 10, -3), (3, 10, 4)]
    got = _collect(spark, rows, 4)
    assert got == {0: False, 1: False, 2: False, 3: True}


def test_validation(spark):
    with pytest.raises(ValueError):
        textstats.token_budget_select(_scored(spark, [(0, 1, 1)]), -1)


def test_plan_is_histogram_decomposed_not_global_sort(spark):
    """Exactly ONE single-partition exchange (the bounded histogram's
    running total) — the corpus-sized side is decided by a broadcast
    join plus a window over only the boundary bucket, never a global
    sort of all rows."""
    scored = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 * 100).alias("milli_bits_per_token"),
        (F.col("id") % 13 + 1).alias("n_tokens"),
    )
    q = textstats.token_budget_select(scored, 5000)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the bounded histogram's running total is planned once per verdict
    # branch (decided / boundary) — each single-partition exchange is
    # over the <=64k-row histogram, never the corpus, so exactly 2
    assert plan.count("Exchange SinglePartition") == 2
    assert "BroadcastHashJoin" in plan  # bounded histogram joins broadcast
    assert "EvalPython" not in plan
