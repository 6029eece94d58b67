"""Physical-plan shape assertions — the scale contract, checked in CI:
pushdown reaches the parquet scan, small dims broadcast, the extraction
pipeline shuffles exactly once, and hot-path expressions stay in
WholeStageCodegen (no Python in the relational operators)."""

from __future__ import annotations

import pytest

from pdf_extract_spark import generator
from pdf_extract_spark.pipeline import run_extraction
from pdf_extract_spark.queries import QUERIES
from pdf_extract_spark.schemas import DOCUMENTS

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(QUERIES["pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    plan = _plan(QUERIES["status_counts"](spark, SF))
    # scan must read only the status column, not the whole orders schema
    assert "ReadSchema: struct<o_orderstatus:string>" in plan


def test_broadcast_join_selected(spark):
    plan = _plan(QUERIES["join_orders_customers"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_extraction_single_exchange(spark):
    docs = spark.createDataFrame(generator.make_corpus(10, seed=2), schema=DOCUMENTS)
    df = run_extraction(docs, num_partitions=4)
    plan = _plan(df)
    # exactly one Exchange node: the mandated repartitionByRange
    n_exchange = plan.count("+- Exchange") + plan.count("   Exchange")
    assert "rangepartitioning" in plan
    assert n_exchange == 1, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_agg_is_partial_and_jvm_side(spark):
    df = QUERIES["pricing_summary"](spark, SF)
    plan = _plan(df)
    # map-side combine (partial aggregation) before the exchange
    assert "partial_sum" in plan
    assert "ArrowEvalPython" not in plan  # no Python in the relational path
    assert "BatchEvalPython" not in plan
    # whole-stage codegen spans appear once AQE finalizes the plan
    df.collect()
    final = _plan(df)
    assert "isFinalPlan=true" in final
    assert "*(" in final  # the WholeStageCodegen stage marker


@pytest.mark.parametrize("name", ["token_count", "quality_score", "lang_id", "textclean"])
def test_text_ops_are_jvm_side(spark, name):
    """Text-analysis queries must compile to pure Catalyst expressions —
    no Python evaluation nodes anywhere in the plan."""
    plan = _plan(QUERIES[name](spark, SF))
    assert "EvalPython" not in plan, name
