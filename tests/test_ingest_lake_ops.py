"""Behavior + plan pins for the ingest/lake-ops wave: bloom_ingest
(no false negatives, measured false positives, bit-set merge algebra,
no history broadcast), site_quality (gate semantics, no-url bucket),
encoding_audit (damage classes, zero Exchange), compaction_plan
(bin invariants, per-partition independence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark import curation
from pdf_extract_spark.operators import dedup, textstats, weburl


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------- bloom_ingest

def test_bloom_no_false_negatives(spark):
    hist = _docs(spark, [(i, f"history doc {i}") for i in range(64)])
    batch = _docs(
        spark,
        [(100 + i, f"history doc {i}") for i in range(8)]
        + [(200 + i, f"fresh doc {i}") for i in range(56)],
    )
    out = dedup.bloom_ingest(hist, batch, m=64, k=2).collect()
    v = {r["doc_id"]: r for r in out}
    assert len(out) == 64
    # an identical fingerprint probes identical positions: every replay
    # MUST be bloom-positive and confirm as a true dup
    for i in range(8):
        assert v[100 + i]["bloom_hit"] is True
        assert v[100 + i]["verdict"] == "dup"
    # fresh docs can false-positive (m=64 is saturated) but NEVER 'dup'
    assert all(v[200 + i]["verdict"] in ("new", "false_positive")
               for i in range(56))
    # at 64 bits / 64 history docs the filter is saturated enough that
    # the deterministic hash chain yields at least one FP witness
    assert any(v[200 + i]["verdict"] == "false_positive" for i in range(56))
    # a bloom-negative doc is always plain 'new' (never reached confirm)
    assert all(r["verdict"] == "new" for r in out if not r["bloom_hit"])


def test_bloom_bitset_merge_property(spark):
    """distinct(positions(h1 UNION h2)) == distinct(pos(h1)) |
    distinct(pos(h2)) — distinct distributes over union, so
    yesterday's bit set unions with today's batch positions without
    re-reading history (the same algebra minhash_merge relies on)."""
    h1 = _docs(spark, [(i, f"alpha {i}") for i in range(20)])
    h2 = _docs(spark, [(i, f"beta {i}") for i in range(20)])

    def bits(df):
        fp = dedup.phash(dedup.norm_text(F.col("text")))
        return {
            r["pos"]
            for r in df.select(
                F.explode(dedup._bloom_positions(fp, 128, 3)).alias("pos")
            ).distinct().collect()
        }

    assert bits(h1.unionByName(h2)) == bits(h1) | bits(h2)


def test_bloom_plan_broadcasts_bits_not_history(spark):
    """The ONLY broadcast is the bounded bit set; the corpus-sized
    history-fingerprint confirm join must stay a shuffle join (the r4
    _cap_hot_bands lesson: never broadcast the unbounded side)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hist = _docs(spark, [(i, f"history doc {i}") for i in range(40)])
        batch = _docs(spark, [(100 + i, f"fresh doc {i}") for i in range(40)])
        df = dedup.bloom_ingest(hist, batch, m=256, k=3)
        df.collect()  # AQE materializes exchange reuse at runtime
        full = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    i, j = full.find("== Final Plan =="), full.find("== Initial Plan ==")
    final = full[i:j] if 0 <= i < j else full
    # exactly ONE broadcast: the bounded bit set (the probe side)
    assert final.count("BroadcastExchange") == 1, final
    # history fingerprints reach the confirm join via a shuffle join
    assert "SortMergeJoin" in final, final
    # the probe aggregate is computed ONCE: the negative branch of the
    # union rides a ReusedExchange, not a second probe pass
    assert "ReusedExchange" in final, final


# ------------------------------------------------------- site_quality

def test_site_quality_gate(spark):
    good = "the value is a good one, and it is the best of the set."
    junk = "zzz qqq xxx"
    rows = [
        (1, "http://good.example/a", good),
        (2, "http://good.example/b", good),
        (3, "http://junk.example/a", junk),
        (4, "http://junk.example/b", junk),
        (5, "http://lone.example/a", good),      # below min_docs
        (6, "mailto:x@example.org", good),       # no host
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r["domain"]: r for r in weburl.site_quality(
        df, min_docs=2, milli_threshold=300).collect()}
    assert out["good.example"]["site_kept"] is True
    assert out["good.example"]["n_docs"] == 2
    assert out["junk.example"]["site_kept"] is False
    assert out["lone.example"]["site_kept"] is False  # min_docs gate
    assert "(no-url)" in out                          # never silently dropped
    assert out["(no-url)"]["n_docs"] == 1


def test_site_quality_mean_is_integer_exact(spark):
    from pdf_extract_spark.operators.textstats import quality_expr

    rows = [(i, "http://h.example/x", "word " * (i + 1)) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    (row,) = weburl.site_quality(df, min_docs=1, milli_threshold=0).collect()
    millis = [
        r["m"]
        for r in df.select(
            F.coalesce((quality_expr(F.col("text")) * 1000).cast("long"),
                       F.lit(0)).alias("m")
        ).collect()
    ]
    assert row["mean_milli_q"] == sum(millis) // len(millis)


# ----------------------------------------------------- encoding_audit

def test_encoding_audit_damage_classes(spark):
    rows = [
        (1, "clean ascii text only"),
        (2, "caf\u00c3\u00a9 mojibake pair"),   # \u00c3 + continuation byte
        (3, "smart \u00e2\u20ac\u2122 quote"),  # the \u00e2\u20ac pair
        (4, "bad\u0007ctrl and\u0001 another"),
        (5, "lossy \ufffd decode \ufffd twice"),
        (6, "tabs\tand\nnewlines are fine"),
    ]
    out = {r["doc_id"]: r for r in textstats.encoding_audit(
        _docs(spark, rows)).collect()}
    assert out[1]["is_clean"] is True
    assert out[2]["n_mojibake"] == 1 and out[2]["is_clean"] is False
    assert out[3]["n_mojibake"] == 1
    assert out[4]["n_ctrl"] == 2 and out[4]["is_clean"] is False
    assert out[5]["n_replacement"] == 2
    assert out[6]["is_clean"] is True  # \t \n \r are not damage


def test_encoding_audit_zero_exchange(spark):
    df = textstats.encoding_audit(_docs(spark, [(1, "x")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan  # pure JVM regex, no UDF


# ---------------------------------------------------- compaction_plan

def test_compaction_bin_invariants(spark):
    files = spark.createDataFrame(
        [("p", i, 100) for i in range(10)] + [("q", 0, 1000), ("q", 1, 10)],
        "part string, file_id long, size_bytes long",
    )
    out = curation.compaction_plan(files, target_bytes=250).collect()
    p = sorted((r for r in out if r["part"] == "p"),
               key=lambda r: r["file_id"])
    bins = [r["bin"] for r in p]
    # preceding cumsum 0,100,...,900 over target 250 -> DIV boundaries
    assert bins == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # bins are contiguous and nondecreasing in file order
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # partitions plan independently: q restarts at bin 0, its second
    # file's preceding cumsum (1000) lands in bin 4
    q = sorted((r for r in out if r["part"] == "q"),
               key=lambda r: r["file_id"])
    assert [r["bin"] for r in q] == [0, 4]


def test_compaction_rejects_nonpositive_target():
    with pytest.raises(ValueError):
        curation.compaction_plan(None, 0)
    with pytest.raises(ValueError):
        curation.compaction_plan_sql("SELECT 1", -5)
