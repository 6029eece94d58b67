"""dup_gram_profile: per-document duplication fractions — planted
boilerplate reads 1000 milli, unique text 0, NULL/empty text zero
counts; min_df threshold; gram-keyed (non-broadcast-dependent) plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_full_unique_zero(spark):
    boiler = "identical boilerplate sentence repeated across pages here"
    corpus = _df(spark, [
        (0, boiler), (1, boiler), (2, boiler),
        (3, "entirely unique words nobody else ever wrote down today"),
    ])
    out = {r["doc_id"]: r for r in dedup.dup_gram_profile(corpus).collect()}
    assert all(out[i]["milli_dup_frac"] == 1000 for i in (0, 1, 2))
    assert out[3]["n_dup_grams"] == 0 and out[3]["milli_dup_frac"] == 0


def test_partial_overlap_fraction(spark):
    shared = "one two three four five"  # a single shared 5-gram
    corpus = _df(spark, [
        (0, shared + " unique tail a b c d"),
        (1, shared + " other ending x y z w"),
    ])
    out = {r["doc_id"]: r for r in dedup.dup_gram_profile(corpus).collect()}
    for i in (0, 1):
        # 11 tokens -> 7 distinct 5-grams, exactly one shared
        assert out[i]["n_grams"] == 7 and out[i]["n_dup_grams"] == 1
        assert out[i]["milli_dup_frac"] == 1000 // 7


def test_null_and_empty_text_no_grams(spark):
    corpus = _df(spark, [(0, None), (1, ""), (2, "real words here now five")])
    out = {r["doc_id"]: r for r in dedup.dup_gram_profile(corpus).collect()}
    for i in (0, 1):
        assert out[i]["n_grams"] == 0 and out[i]["n_dup_grams"] == 0
        assert out[i]["milli_dup_frac"] is None
    assert out[2]["n_grams"] == 1  # exactly 5 tokens -> one real 5-gram


def test_min_df_threshold(spark):
    boiler = "same short doc"
    corpus = _df(spark, [(0, boiler), (1, boiler), (2, boiler)])
    strict = {r["doc_id"]: r["n_dup_grams"]
              for r in dedup.dup_gram_profile(corpus, min_df=4).collect()}
    assert strict == {0: 0, 1: 0, 2: 0}  # df=3 < 4
    with pytest.raises(ValueError):
        dedup.dup_gram_profile(corpus, min_df=0)


def test_plan_gram_keyed_join_no_python(spark):
    corpus = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 9).cast("string"),
                 F.lit(" page body words repeated enough times here")).alias("text"),
    )
    q = dedup.dup_gram_profile(corpus)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
    assert "hashpartitioning(g" in plan  # df aggregate + join keyed on the gram
