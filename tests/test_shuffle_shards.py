"""shuffle_shards: deterministic training-order shuffle — md5-reference
parity, global_pos bijectivity, seed permutation, partitioning
invariance, validation, and the one-shuffle + reused-exchange +
broadcast-offsets plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import packing


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _naive(keys, n_shards, salt="shuf", seed=0):
    rows = [(k, _phash(f"{salt}:{seed}:{k}")) for k in keys]
    out, gpos = {}, 0
    for shard in range(n_shards):
        members = sorted(
            ((k, h) for k, h in rows if h % n_shards == shard),
            key=lambda r: (r[1], r[0]),
        )
        for p, (k, _) in enumerate(members):
            out[k] = (shard, p, gpos)
            gpos += 1
    return out


def _run(spark, n, n_shards, seed=0, repartition=None):
    df = spark.range(0, n).select(F.col("id").alias("doc_id"))
    if repartition is not None:
        df = df.repartition(repartition)
    out = packing.shuffle_shards(df, n_shards=n_shards, seed=seed)
    return {
        r["doc_id"]: (r["shard"], r["pos_in_shard"], r["global_pos"])
        for r in out.collect()
    }


@pytest.mark.parametrize("n_shards", [1, 7, 64])
def test_matches_md5_reference(spark, n_shards):
    assert _run(spark, 200, n_shards) == _naive(range(200), n_shards)


def test_global_pos_is_a_bijection(spark):
    got = _run(spark, 300, 16)
    assert sorted(v[2] for v in got.values()) == list(range(300))
    # global order = shard-major, pos_in_shard-minor
    by_gpos = sorted(got.values(), key=lambda v: v[2])
    assert by_gpos == sorted(by_gpos, key=lambda v: (v[0], v[1]))


def test_seed_gives_a_fresh_permutation(spark):
    a = _run(spark, 200, 8, seed=0)
    b = _run(spark, 200, 8, seed=1)
    assert a != b
    assert sorted(v[2] for v in b.values()) == list(range(200))


def test_partitioning_invariance(spark):
    """The order is a pure function of (salt, seed, key) — input
    partitioning must not matter (df.sample's failure mode)."""
    assert _run(spark, 150, 8) == _run(spark, 150, 8, repartition=13)


def test_validation(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        packing.shuffle_shards(df, n_shards=0)
    with pytest.raises(ValueError):
        packing.shuffle_shards_sql(n_shards=0)


def test_plan_one_shuffle_reused_exchange_broadcast_offsets(spark):
    """ONE data shuffle (hashpartitioning on shard); the shard-size
    aggregate rides it as a ReusedExchange (no second scan of the
    corpus); the offsets relation is broadcast back (never a sort-merge
    join against n_shards rows); the cumulative offset runs on a single
    bounded partition."""
    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = packing.shuffle_shards(df, n_shards=32)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    final = plan.split("== Initial Plan ==")[0]  # AQE appends the pre-
    # runtime plan below; exchange reuse only materializes in the final
    assert "ReusedExchange" in final
    assert "BroadcastHashJoin" in final
    # exactly one materialized data shuffle: the rank window's exchange
    # plus the ReusedExchange node that points back at it
    assert final.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in final
