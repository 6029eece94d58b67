"""gram_novelty: first-owner attribution in ingestion order, the
sum(n_novel) == |distinct grams| conservation invariant, and the
NULL/empty-text gram gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "alpha beta gamma delta epsilon zeta"  # one 5-gram window x2


def test_first_owner_wins(spark):
    """The earliest doc_id owns every shared gram; later copies score
    zero novelty."""
    docs = _docs(spark, [
        (10, SHARED),
        (20, SHARED),
        (30, SHARED),
        (40, "totally unique words never repeated anywhere else here"),
    ])
    out = {r["doc_id"]: r for r in dedup.gram_novelty(docs, k=5).collect()}
    assert out[10]["milli_novel"] == 1000
    assert out[20]["milli_novel"] == 0 and out[30]["milli_novel"] == 0
    assert out[40]["milli_novel"] == 1000
    assert out[20]["n_grams"] == out[10]["n_grams"] == 2


def test_novelty_conserves_distinct_grams(spark):
    """Each gram is attributed to exactly one document: corpus-wide
    sum(n_novel) equals the number of distinct grams."""
    docs = _docs(spark, [
        (1, SHARED),
        (2, SHARED + " extra trailing words here"),
        (3, "another body of text with plenty of distinct tokens inside"),
    ])
    out = dedup.gram_novelty(docs, k=5)
    total_novel = out.agg(F.sum("n_novel")).collect()[0][0]
    n_distinct = (
        docs.select(F.explode(dedup.shingles(F.col("text"), 5)).alias("g"))
        .select("g").distinct().count()
    )
    assert total_novel == n_distinct


def test_null_and_empty_text_contribute_no_grams(spark):
    """NULL/zero-token docs keep zero counts and a NULL fraction — and
    crucially never own an '' gram that another empty doc would then
    read as non-novel."""
    docs = _docs(spark, [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "real content with enough words for one gram"),
    ])
    out = {r["doc_id"]: r for r in dedup.gram_novelty(docs, k=5).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_grams"] == 0 and out[d]["n_novel"] == 0
        assert out[d]["milli_novel"] is None
    assert out[4]["milli_novel"] == 1000


def test_short_doc_whole_text_fallback_owned_once(spark):
    """Docs shorter than k fall back to the whole-text shingle; two
    identical short docs -> the earlier one owns it."""
    docs = _docs(spark, [(7, "tiny doc"), (8, "tiny doc")])
    out = {r["doc_id"]: r for r in dedup.gram_novelty(docs, k=5).collect()}
    assert out[7]["milli_novel"] == 1000 and out[8]["milli_novel"] == 0


def test_plan_owner_join_gram_keyed_no_python(spark):
    """Min-owner aggregate and owner join are keyed on the gram; with
    auto-broadcast disabled nothing broadcasts (the owner table is
    vocabulary-sized by construction)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        corpus = spark.range(0, 400).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("w"), (F.col("id") % 9).cast("string"),
                F.lit(" page body words repeated enough times here"),
            ).alias("text"),
        )
        q = dedup.gram_novelty(corpus)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(g" in plan
        assert "BroadcastExchange" not in plan
        assert "EvalPython" not in plan and "CartesianProduct" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
