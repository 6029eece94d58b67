"""unigram_surprisal / quality_buckets semantics: exact integer
surprisal arithmetic, zero-token NULL handling, bucket boundary rules,
the approx_percentile sketch path, and the scale-shape plan pins (the
threshold join broadcasts; the corpus never windows/shuffles by lang).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import textstats


def _docs(spark):
    # hand-computable corpus: 10 tokens total -> flog2(10) = 3 bits max
    # freq: the=4, cat=2, sat=2, qux=1, zap=1
    return spark.createDataFrame(
        [
            (0, "the cat sat", "en"),
            (1, "the cat sat the", "en"),
            (2, "qux zap the", "xx"),
            (3, "", "en"),       # zero tokens
            (4, None, "en"),     # NULL text == zero tokens
        ],
        "doc_id long, text string, lang string",
    )


def test_surprisal_exact_bits(spark):
    rows = {
        r["doc_id"]: r
        for r in textstats.unigram_surprisal(_docs(spark)).collect()
    }
    # N=10 -> flog2=3; bits(tok) = 3 - flog2(cnt):
    #   the: 3-2=1, cat/sat: 3-1=2, qux/zap: 3-0=3
    assert rows[0]["total_bits"] == 1 + 2 + 2
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["milli_bits_per_token"] == 5000 // 3  # trunc division
    assert rows[1]["total_bits"] == 1 + 2 + 2 + 1
    assert rows[2]["total_bits"] == 3 + 3 + 1


def test_surprisal_zero_token_docs(spark):
    rows = {
        r["doc_id"]: r
        for r in textstats.unigram_surprisal(_docs(spark)).collect()
    }
    for d in (3, 4):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["total_bits"] == 0
        assert rows[d]["milli_bits_per_token"] is None


def test_quality_buckets_semantics(spark):
    out = {
        r["doc_id"]: r
        for r in textstats.quality_buckets(_docs(spark)).collect()
    }
    # every scored doc gets a bucket; zero-token docs get NULL
    assert out[3]["bucket"] is None and out[4]["bucket"] is None
    assert out[2]["bucket"] == "head"  # only scored doc in lang=xx
    # en scored docs: doc0 mbpt=1666, doc1 mbpt=1500 -> q25/q75 of
    # {1500,1666} = 1541.5 / 1624.5: 1500 -> head, 1666 -> tail
    assert out[1]["bucket"] == "head"
    assert out[0]["bucket"] == "tail"
    # lowest-surprisal quarter is head (CCNet orientation): the head
    # doc's score is <= the tail doc's score within each lang
    assert (
        out[1]["milli_bits_per_token"] <= out[0]["milli_bits_per_token"]
    )


def test_quality_buckets_approx_path(spark):
    """relative_error swaps in the mergeable sketch. approx_percentile
    is rank-based (returns members of the value set) while the exact
    path interpolates, so buckets need not be identical even on tiny
    input — the invariants are: every scored doc gets a bucket, NULLs
    stay NULL, and buckets are monotone in the score within a lang."""
    approx = textstats.quality_buckets(
        _docs(spark), relative_error=0.01
    ).collect()
    rows = {r["doc_id"]: r for r in approx}
    assert rows[3]["bucket"] is None and rows[4]["bucket"] is None
    order = {"head": 0, "middle": 1, "tail": 2}
    by_lang: dict[str, list] = {}
    for r in approx:
        if r["bucket"] is not None:
            by_lang.setdefault(r["lang"], []).append(r)
    for rs in by_lang.values():
        rs.sort(key=lambda r: r["milli_bits_per_token"])
        ranks = [order[r["bucket"]] for r in rs]
        assert ranks == sorted(ranks)  # monotone in score


def test_quality_buckets_plan_shape(spark):
    """Scale pins: the per-stratum threshold table joins by BROADCAST
    (never a shuffle of the corpus by lang) and no window function
    appears anywhere (quartiles come from an aggregate, not a sort)."""
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 17).cast("string")).alias(
            "text"
        ),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
    plan = textstats.quality_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
