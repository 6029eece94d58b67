"""Bucketed co-located join: zero Exchange operators in the join plan."""

from __future__ import annotations

import pytest

from pdf_extract_spark import bucketing

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    # warehouse.dir is a static conf — leave the session default (cwd
    # spark-warehouse, cleaned up by the DROP TABLEs below)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    bucketing.write_bucketed(o, "orders_b", "o_orderkey", buckets=8)
    bucketing.write_bucketed(li, "lineitem_b", "l_orderkey", buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_colocated_join_no_exchange(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketing.colocated_join(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point: no shuffle at all
        # and the result is correct vs a plain join
        o = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        plain = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_same_key_name(spark, bucketed_tables):
    """Both sides bucketed on a column with the SAME name must not raise
    an ambiguous-reference AnalysisException (the aliased condition)."""
    o = spark.table("orders_b").withColumnRenamed("o_orderkey", "orderkey")
    li = spark.table("lineitem_b").withColumnRenamed("l_orderkey", "orderkey")
    bucketing.write_bucketed(o, "orders_same", "orderkey", buckets=8)
    bucketing.write_bucketed(li, "lineitem_same", "orderkey", buckets=8)
    try:
        j = bucketing.colocated_join(
            spark, "orders_same", "lineitem_same", "orderkey", "orderkey"
        )
        assert j.count() == spark.table("orders_b").join(
            spark.table("lineitem_b"),
            spark.table("orders_b").o_orderkey == spark.table("lineitem_b").l_orderkey,
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_same")
        spark.sql("DROP TABLE IF EXISTS lineitem_same")
