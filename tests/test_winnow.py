"""Winnowing fingerprints: the Schleimer et al. guarantee (any shared
token run of >= k+w-1 tokens leaves a shared fingerprint), short-doc
fallbacks, overlap-pair semantics, and the self-join scale pins (fp
table materialized once, join carries ids only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup


def test_winnow_shared_passage_guarantee(spark):
    """Two docs embedding the same (k+w-1)-token run in otherwise
    disjoint text MUST share >= 1 fingerprint; fully disjoint docs with
    unique vocab share none."""
    k, w = 4, 4
    shared = " ".join(f"shared{i}" for i in range(k + w - 1))  # 7 tokens
    rows = [
        (0, " ".join(f"a{i}" for i in range(20)) + " " + shared
            + " " + " ".join(f"b{i}" for i in range(20))),
        (1, " ".join(f"c{i}" for i in range(15)) + " " + shared
            + " " + " ".join(f"d{i}" for i in range(25))),
        (2, " ".join(f"e{i}" for i in range(40))),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        d: {r["fp"] for r in grp}
        for d, grp in __import__("itertools").groupby(
            sorted(
                dedup.winnow_fingerprints(df, k=k, w=w).collect(),
                key=lambda r: r["doc_id"],
            ),
            key=lambda r: r["doc_id"],
        )
    }
    assert fps[0] & fps[1], "shared passage must produce a shared fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])

    pairs = dedup.substring_overlap(df, k=k, w=w, min_shared=1).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]


def test_winnow_short_doc_fallbacks(spark):
    """Docs shorter than k tokens get ONE whole-text fingerprint; docs
    with fewer than w grams get the single global gram minimum — and
    identical short docs still collide."""
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, "tiny doc"), (2, "five little words here now")],
        "doc_id long, text string",
    )
    out = dedup.winnow_fingerprints(df, k=4, w=4).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["fp"])
    assert len(per_doc[0]) == 1 and per_doc[0] == per_doc[1]
    assert len(per_doc[2]) == 1  # 5 tokens -> 2 grams -> < w -> global min
    with pytest.raises(ValueError):
        dedup.winnow_fingerprints(df, k=0)


def test_substring_overlap_plan_reuses_fp_exchange(spark):
    """The minhash band-join discipline: one Exchange on fp materializes
    the fingerprint table; the self-join's second side must be a
    ReusedExchange (never a recompute of the gram chain), and no Python
    appears anywhere."""
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("tok"), (F.col("id") % 9).cast("string"),
            F.lit(" common run of words here "),
            F.lit("u"), F.col("id").cast("string"),
        ).alias("text"),
    )
    # pin the scale shape: disable AQE's tiny-input broadcast rewrite
    # (CLAUDE.md gotcha) so the assert validates the documented
    # sort-merge + ReusedExchange plan, not an accidental broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = dedup.substring_overlap(df, min_shared=1, max_bucket=128)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" not in plan
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


def test_substring_overlap_max_bucket_drops_boilerplate(spark):
    """A fingerprint shared by EVERY doc (boilerplate) is excluded by
    max_bucket, leaving only the planted pair."""
    boiler = " ".join(f"nav{i}" for i in range(10))
    rows = [(i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(15)))
            for i in range(20)]
    # plant one genuine pair sharing a non-boilerplate passage
    passage = " ".join(f"quote{j}" for j in range(10))
    rows[3] = (3, rows[3][1] + " " + passage)
    rows[7] = (7, rows[7][1] + " " + passage)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.substring_overlap(df, min_shared=1, max_bucket=5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in capped] == [(3, 7)]
    uncapped = dedup.substring_overlap(df, min_shared=1).collect()
    assert len(uncapped) == 20 * 19 // 2  # boilerplate pairs everyone


def test_winnow_null_text_twin_faithful(spark):
    """NULL text must yield NO fingerprint rows in BOTH engines —
    DuckDB's list_prepend(0, NULL) would otherwise fabricate
    fingerprint 0, aliasing NULL-text docs with EMPTY-text docs (and
    pairing them in substring_overlap where Spark's NULL never
    equi-joins). Empty text keeps its whole-text hash 0."""
    import duckdb

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "some real tokens here")],
        "doc_id long, text string",
    )
    srows = sorted(
        (r["doc_id"], r["fp"])
        for r in dedup.winnow_fingerprints(df, k=4, w=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES (0::BIGINT, NULL::VARCHAR),"
        " (1::BIGINT, ''), (2::BIGINT, 'some real tokens here')) v(doc_id, text)"
    )
    orows = sorted(
        tuple(r)
        for r in con.sql(
            dedup.winnow_fingerprints_sql(table="t")
        ).fetchall()
    )
    assert srows == orows
    assert not any(d == 0 for d, _ in srows)  # NULL text -> no rows
    assert (1, 0) in srows                    # empty text -> hash 0
    # and no overlap pair between the NULL-text and empty-text docs
    pairs = dedup.substring_overlap(df, min_shared=1).collect()
    assert not any({r["doc_a"], r["doc_b"]} == {0, 1} for r in pairs)
