"""cluster_keepbest: argmax representative per near-dup cluster —
keeper choice, tie-breaks, NULL-score ranking, singleton behavior and
the window-free plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup


def _labels(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, component long")


def _quality(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_keeper_is_argmax_with_min_id_tiebreak(spark):
    labels = _labels(spark, [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)])
    quality = _quality(spark, [(0, 10), (1, 99), (2, 99), (5, 7), (6, 3)])
    out = {
        r["doc_id"]: (r["keeper_id"], r["best_score"], r["is_keeper"])
        for r in dedup.cluster_keepbest(labels, quality).collect()
    }
    # cluster 0: docs 1 and 2 tie at 99 -> keeper is min id 1
    assert out[0] == (1, 99, False)
    assert out[1] == (1, 99, True)
    assert out[2] == (1, 99, False)
    # cluster 5: doc 5 wins on score
    assert out[5] == (5, 7, True) and out[6] == (5, 7, False)


def test_scoreless_members_rank_below_even_negative_scores(spark):
    """NULL score, or NO quality row at all (gated scorers), ranks
    below every scored member — including NEGATIVE scores, which a
    sentinel like -1 would outrank; a scoreless keeper reports NULL."""
    labels = _labels(spark, [(0, 0), (1, 0), (5, 5), (6, 5), (7, 5), (9, 9)])
    # doc 0: NULL score; doc 7: no quality row at all; doc 5: negative
    quality = _quality(spark, [(0, None), (1, 1), (5, -7), (6, None), (9, None)])
    out = {r["doc_id"]: r for r in dedup.cluster_keepbest(labels, quality).collect()}
    assert len(out) == 6  # missing quality rows are kept, not dropped
    assert out[1]["is_keeper"] and not out[0]["is_keeper"]
    # cluster 5: the only scored member wins despite its negative score
    assert out[5]["is_keeper"] and out[5]["best_score"] == -7
    assert not out[6]["is_keeper"] and not out[7]["is_keeper"]
    # all-scoreless singleton: keeper by id, best_score NULL
    assert out[9]["is_keeper"] and out[9]["best_score"] is None


def test_end_to_end_keeps_longest_member(spark):
    """Composed with minhash pairs + components: the keeper of a planted
    near-dup family is its longest member, not its smallest id."""
    base = "shared boilerplate run of many words " * 8
    # tails stay short: a long divergent tail dilutes the shingle-set
    # Jaccard below the LSH threshold and the family never clusters
    docs = spark.createDataFrame(
        [(1, base + "tail one"), (2, base + "tail one more"),
         (3, base), (50, "completely unrelated organic text")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs(docs)
    labels = dedup.dedup_components(pairs, universe=docs)
    quality = docs.select("doc_id", F.length("text").alias("n_chars"))
    out = {r["doc_id"]: r for r in dedup.cluster_keepbest(labels, quality).collect()}
    fam = [out[i] for i in (1, 2, 3)]
    assert all(r["keeper_id"] == 2 for r in fam)  # longest, not min id
    assert out[2]["is_keeper"] and not out[1]["is_keeper"]
    assert out[50]["is_keeper"]  # singleton keeps itself


def test_plan_is_window_free_partial_aggregate(spark):
    labels = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50).alias("component")
    )
    quality = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).alias("n_chars")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = dedup.cluster_keepbest(labels, quality)
        q.collect()  # exchange reuse only materializes in the final AQE plan
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Window" not in plan  # struct-min argmax, no per-cluster funnel
    assert "partial_min" in plan  # map-side combine of the struct argmax
    # the explicit repartition(component) is shared by the keeper
    # aggregate and the verdict rejoin — labels+quality compute ONCE
    assert "ReusedExchange" in plan
    assert "EvalPython" not in plan
