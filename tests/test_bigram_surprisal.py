"""bigram_surprisal: hand-computed bits for the seen / backoff / OOV
paths, the <2-token edge, and train/score separation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import textstats
from pdf_extract_spark.operators.textstats import BIGRAM_BACKOFF_BITS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_seen_backoff_and_oov_paths(spark):
    """Train: "a b a b c" x2 -> unigrams a:4 b:4 c:2 (N=10); bigrams
    (a,b):4 (b,a):2 (b,c):2. flog2: N=10->3, 4->2, 2->1.

    Score doc 1 "a b" : seen bigram, bits = flog2(c(a)) - flog2(c(a,b))
      = 2 - 2 = 0.
    Score doc 2 "c a" : unseen bigram, both tokens known -> backoff
      bits = P + flog2(N) - flog2(c(a)) = P + 3 - 2.
    Score doc 3 "a zzz": unseen bigram, w2 OOV -> bits = P + 3 + 1."""
    train = _docs(spark, [(0, "a b a b c"), (1, "a b a b c")])
    score = _docs(spark, [(1, "a b"), (2, "c a"), (3, "a zzz")])
    out = {r["doc_id"]: r for r in
           textstats.bigram_surprisal(train, score).collect()}
    assert out[1]["total_bits"] == 0 and out[1]["n_backoff"] == 0
    assert out[2]["total_bits"] == BIGRAM_BACKOFF_BITS + 1
    assert out[2]["n_backoff"] == 1
    assert out[3]["total_bits"] == BIGRAM_BACKOFF_BITS + 4
    assert out[3]["n_backoff"] == 1
    assert out[1]["milli_bits_per_bigram"] == 0
    assert out[3]["milli_bits_per_bigram"] == (BIGRAM_BACKOFF_BITS + 4) * 1000


def test_under_two_tokens_zero_counts_null_average(spark):
    train = _docs(spark, [(0, "a b c d")])
    score = _docs(spark, [(1, "single"), (2, ""), (3, None), (4, "a b")])
    out = {r["doc_id"]: r for r in
           textstats.bigram_surprisal(train, score).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_bigrams"] == 0 and out[d]["total_bits"] == 0
        assert out[d]["milli_bits_per_bigram"] is None
    assert out[4]["n_bigrams"] == 1


def test_repeated_bigram_in_doc_counted_per_occurrence(spark):
    """Scoring is per adjacent pair, not per distinct pair: "a b a b"
    has 3 bigrams (a,b) (b,a) (a,b)."""
    train = _docs(spark, [(0, "a b a b a")])  # c(a,b)=2 c(b,a)=2 a:3 b:2 N=5
    score = _docs(spark, [(1, "a b a b")])
    r = textstats.bigram_surprisal(train, score).collect()[0]
    assert r["n_bigrams"] == 3
    # bits(a,b) = flog2(3)-flog2(2) = 1-1 = 0; bits(b,a) = flog2(2)-flog2(2)=0
    assert r["total_bits"] == 0


def test_milli_average_trunc(spark):
    """milli average is 1000*total DIV n — trunc division, engine-exact."""
    train = _docs(spark, [(0, "x y x z")])  # x:2 y:1 z:1 N=4; (x,y)1 (y,x)1 (x,z)1
    score = _docs(spark, [(1, "x y x")])    # (x,y): f(2)-f(1)=1; (y,x): f(1)-f(1)=0
    r = textstats.bigram_surprisal(train, score).collect()[0]
    assert r["total_bits"] == 1 and r["n_bigrams"] == 2
    assert r["milli_bits_per_bigram"] == 500


def test_plan_lm_tables_key_shuffled_single_broadcast(spark):
    """With auto-broadcast disabled, the ONLY BroadcastExchange is the
    single-row corpus total — the bigram/unigram LM tables join as
    key-shuffled SortMergeJoins (a web-scale LM never broadcasts), and
    the whole chain is JVM-side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        corpus = spark.range(0, 500).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha w"), (F.col("id") % 11).cast("string"),
                F.lit(" beta gamma delta"),
            ).alias("text"),
        )
        q = textstats.bigram_surprisal(
            corpus.filter(F.col("doc_id") % 2 == 0),
            corpus.filter(F.col("doc_id") % 2 == 1),
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastExchange") == 1  # the 1-row total only
        assert "SortMergeJoin" in plan
        assert "EvalPython" not in plan and "CartesianProduct" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
