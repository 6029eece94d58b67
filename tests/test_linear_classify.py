"""linear_classify: fastText-style hashed-BoW inference — sign of the
verdict, OOV zero-weight, collision summing, sign-split division,
zero-token edges, bounded-broadcast plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import textstats
from pdf_extract_spark.operators.hashing import phash


def _weights(spark, rows, n_buckets=4096):
    return spark.createDataFrame(rows, "word string, milli_w long").select(
        (phash(F.col("word")) % n_buckets).alias("bucket"), "milli_w"
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positive_negative_and_oov(spark):
    w = _weights(spark, [("good", 1000), ("fine", 500), ("bad", -2000)])
    docs = _docs(spark, [
        (0, "good fine good"),       # (1000+500+1000)/3 = 833
        (1, "bad good"),             # (-2000+1000)/2 -> -500
        (2, "unknown words only"),   # all OOV -> 0, label true at thr 0
    ])
    out = {r["doc_id"]: r for r in textstats.linear_classify(docs, w).collect()}
    assert out[0]["milli_per_token"] == 833 and out[0]["label"]
    assert out[1]["milli_per_token"] == -500 and not out[1]["label"]
    assert out[2]["milli_per_token"] == 0 and out[2]["label"]


def test_duplicate_bucket_rows_are_summed(spark):
    """Two vocabulary words colliding into one bucket must add their
    weights, not fan out the token join."""
    bx = spark.range(1).select(
        (phash(F.lit("x")) % 4096).alias("b")
    ).collect()[0]["b"]
    w = spark.createDataFrame(
        [(bx, 100), (bx, 250)], "bucket long, milli_w long"
    )
    docs = _docs(spark, [(0, "x")])
    r0 = textstats.linear_classify(docs, w).collect()[0]
    assert r0["n_tokens"] == 1  # no fan-out from the duplicate rows
    assert r0["total_milli"] == 350  # summed, not duplicated


def test_zero_token_docs_fail_closed(spark):
    w = _weights(spark, [("good", 1000)])
    docs = _docs(spark, [(0, None), (1, ""), (2, "good")])
    out = {r["doc_id"]: r for r in textstats.linear_classify(docs, w).collect()}
    for i in (0, 1):
        assert out[i]["n_tokens"] == 0
        assert out[i]["milli_per_token"] is None and not out[i]["label"]
    assert out[2]["label"]


def test_negative_total_sign_split_division(spark):
    w = _weights(spark, [("bad", -1001)])
    docs = _docs(spark, [(0, "bad ok")])
    r = textstats.linear_classify(docs, w).collect()[0]
    # -1001 milli over 2 tokens -> trunc toward zero: -(1001 DIV 2) = -500
    assert r["total_milli"] == -1001 and r["milli_per_token"] == -500


def test_validation_and_plan(spark):
    w = _weights(spark, [("good", 1000)])
    docs = _docs(spark, [(0, "good")])
    with pytest.raises(ValueError):
        textstats.linear_classify(docs, w, n_buckets=1)
    big = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 5).cast("string"),
                 F.lit(" body words here")).alias("text"),
    )
    q = textstats.linear_classify(big, w)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bounded weight table broadcasts
    assert "EvalPython" not in plan
