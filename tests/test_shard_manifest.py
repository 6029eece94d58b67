"""shard_manifest: order/partitioning-independent content checksums,
corruption sensitivity, key-content binding, NULL edges, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import textstats


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


ROWS = [(i, f"doc {i} body words w{i % 5}") for i in range(40)] + [
    (100, None), (101, "")
]


def test_manifest_partitioning_and_order_independent(spark):
    a = textstats.shard_manifest(_df(spark, ROWS, 2), n_shards=8)
    b = textstats.shard_manifest(_df(spark, list(reversed(ROWS)), 16), n_shards=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_manifest_detects_single_byte_flip(spark):
    base = textstats.shard_manifest(_df(spark, ROWS), n_shards=4).collect()
    mut = [(i, t.replace("body", "bodY") if i == 7 else t) if t else (i, t)
           for i, t in ROWS]
    flipped = textstats.shard_manifest(_df(spark, mut), n_shards=4).collect()
    ab = {r["shard"]: r["content_xor"] for r in base}
    bb = {r["shard"]: r["content_xor"] for r in flipped}
    assert sum(ab[s] != bb[s] for s in ab) == 1  # exactly doc 7's shard moves
    counts = {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in base}
    assert counts == {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in flipped}


def test_manifest_detects_swapped_texts(spark):
    """Two rows exchanging texts keeps every per-row digest multiset the
    same ONLY if the key weren't bound into the digest — the key:text
    binding must catch the swap."""
    rows = [(0, "alpha"), (1, "beta")]
    swapped = [(0, "beta"), (1, "alpha")]
    a = textstats.shard_manifest(_df(spark, rows), n_shards=1).collect()[0]
    b = textstats.shard_manifest(_df(spark, swapped), n_shards=1).collect()[0]
    assert a["content_xor"] != b["content_xor"]
    assert a["n_docs"] == b["n_docs"] == 2


def test_manifest_validation(spark):
    with pytest.raises(ValueError):
        textstats.shard_manifest(_df(spark, ROWS), n_shards=0)


def test_manifest_plan_single_aggregate_exchange(spark):
    q = textstats.shard_manifest(
        spark.range(0, 500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t "), F.col("id").cast("string")).alias("text"),
        ),
        n_shards=16,
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hashpartitioning, map-side combine
    assert "EvalPython" not in plan and "Window" not in plan
