"""DSIR importance weights (Xie et al. 2023): target-resembling docs
score higher, NULL/empty-text edges, sign-split milli division, bounded
bits-table broadcast plan, and fail-loud validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark import curation


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_target_resembling_docs_score_higher(spark):
    """Corpus docs sharing the target's domain vocabulary must out-rank
    docs that don't — the selection property the paper is for."""
    domain = "alpha beta gamma delta epsilon zeta"
    corpus = _df(spark, [
        (0, "noise0 noise1 noise2 noise3 noise4 " + domain),
        (1, "junk0 junk1 junk2 junk3 junk4 junk5 junk6"),
        (2, "junk7 junk8 junk9 junk10 junk11 junk12"),
    ])
    target = _df(spark, [(100, domain + " " + domain)])
    out = {
        r["doc_id"]: r["milli_bits_per_gram"]
        for r in curation.dsir_weights(corpus, target).collect()
    }
    assert out[0] > out[1] and out[0] > out[2]


def test_dsir_null_and_empty_text(spark):
    """NULL text -> no grams -> zero totals with a NULL average (both
    engines — the SQL twin's th-IS-NULL arm is tested via the oracle);
    empty text falls back to the single whole-text gram."""
    corpus = _df(spark, [(0, None), (1, ""), (2, "some words here")])
    target = _df(spark, [(9, "some words")])
    rows = {r["doc_id"]: r for r in curation.dsir_weights(corpus, target).collect()}
    assert rows[0]["n_grams"] == 0 and rows[0]["total_bits"] == 0
    assert rows[0]["milli_bits_per_gram"] is None
    assert rows[1]["n_grams"] == 1  # whole-text fallback gram
    assert rows[2]["milli_bits_per_gram"] is not None


def test_dsir_sign_split_division_truncates_toward_zero(spark):
    """Negative totals must divide as -((-t)*1000 DIV n) — engines only
    agree on non-negative operands. With one doc of n grams and no
    target overlap, total_bits = -n*flog2(cr+1) is negative; verify the
    exact milli value against the Python computation."""
    corpus = _df(spark, [(0, "w0 w1 w2 w3 w4")])  # 4 bigrams, each cr=1
    target = _df(spark, [(9, "t0 t1")])
    r = curation.dsir_weights(corpus, target).collect()[0]
    # each corpus bucket: cr=1, ct=0 -> bits = flog2(1) - flog2(2) = -1
    assert r["n_grams"] == 4 and r["total_bits"] == -4
    assert r["milli_bits_per_gram"] == -((4 * 1000) // 4)


def test_dsir_validation(spark):
    with pytest.raises(ValueError):
        curation.dsir_weights(
            _df(spark, [(0, "a b")]), _df(spark, [(1, "a b")]), n_buckets=1
        )


def test_dsir_plan_broadcasts_bits_never_shuffles_corpus_by_bucket(spark):
    """The bits table is bounded at n_buckets rows by construction and
    must reach the score pass as a BroadcastHashJoin — the corpus-sized
    gram explode is never shuffled by bucket. No Python, no cartesian
    product."""
    corpus = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string"),
                 F.lit(" common words here")).alias("text"),
    )
    target = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit("common words").alias("text")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = curation.dsir_weights(corpus, target)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan  # the explicit bits broadcast
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
