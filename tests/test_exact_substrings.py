"""Exact shared-substring spans (Lee et al. 2021 exact-substring dedup
as a positional-gram join + diagonal gaps-and-islands merge): span
recovery, maximality, multi-run diagonals, short/NULL-text edges, the
hot-gram cap, and the self-join scale pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup


def _w(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_exact_substrings_recovers_planted_span(spark):
    """A 12-token passage planted at offset 3 in doc 0 and offset 0 in
    doc 1 comes back as ONE maximal run with exact positions and
    length; the unrelated doc 2 matches nothing."""
    passage = _w("sh", 12)
    rows = [
        (0, _w("a", 3) + " " + passage + " " + _w("b", 10)),
        (1, passage + " " + _w("c", 10)),
        (2, _w("d", 30)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_substring_spans(df, min_len=8).collect()
    assert [(r["doc_a"], r["doc_b"], r["pos_a"], r["pos_b"], r["match_len"])
            for r in out] == [(0, 1, 3, 0, 12)]


def test_exact_substrings_two_runs_same_diagonal(spark):
    """Two shared runs separated by a per-doc unique gap sit on the SAME
    diagonal but must come back as TWO maximal spans, not one fused
    run."""
    p1, p2 = _w("x", 9), _w("y", 9)
    rows = [
        (0, p1 + " gap0a gap0b " + p2),
        (1, p1 + " gap1a gap1b " + p2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        dedup.exact_substring_spans(df, min_len=8).collect(),
        key=lambda r: r["pos_a"],
    )
    assert [(r["pos_a"], r["pos_b"], r["match_len"]) for r in out] == [
        (0, 0, 9),
        (11, 11, 9),
    ]


def test_exact_substrings_three_docs_all_pairs(spark):
    """Three docs sharing one passage yield all three ordered pairs."""
    passage = _w("p", 10)
    rows = [(i, f"u{i} " * (i + 1) + passage) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_substring_spans(df, min_len=8).collect()
    pairs = sorted((r["doc_a"], r["doc_b"]) for r in out)
    assert pairs == [(0, 1), (0, 2), (1, 2)]
    assert all(r["match_len"] == 10 for r in out)
    # run start = the doc's filler length on each side
    by_pair = {(r["doc_a"], r["doc_b"]): (r["pos_a"], r["pos_b"]) for r in out}
    assert by_pair[(0, 2)] == (1, 3)


def test_exact_substrings_short_and_null_text(spark):
    """Docs shorter than min_len tokens and NULL-text docs produce no
    gram rows (identical twins: the kernel falls through to the empty
    array, the SQL twin's th-IS-NOT-NULL arm avoids DuckDB's
    list_prepend fabrication); min_len < 2 fails loud."""
    df = spark.createDataFrame(
        [(0, "only three words"), (1, "only three words"), (2, None)],
        "doc_id long, text string",
    )
    assert dedup.exact_substring_spans(df, min_len=8).collect() == []
    with pytest.raises(ValueError):
        dedup.exact_substring_spans(df, min_len=1)


def test_exact_substrings_max_bucket_drops_boilerplate(spark):
    """A passage shared by EVERY doc is a hot gram family — max_bucket
    drops it before the quadratic join; uncapped it pairs everyone."""
    boiler = _w("nav", 10)
    rows = [(i, f"u{i} " + boiler) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.exact_substring_spans(df, min_len=8, max_bucket=5).collect() == []
    uncapped = dedup.exact_substring_spans(df, min_len=8).collect()
    assert len(uncapped) == 12 * 11 // 2


def test_exact_substrings_plan_reuses_gram_exchange(spark):
    """The n>=2 window count's hashpartitioning(gh) exchange IS the
    self-join boundary: the join's second side must be a ReusedExchange
    (never a recompute of the corpus-sized gram chain); no broadcast of
    any gram relation, no Python, no cartesian product."""
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("u"), F.col("id").cast("string"), F.lit(" "),
            F.lit(_w("common", 10)),
        ).alias("text"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = dedup.exact_substring_spans(df, min_len=8)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" not in plan
    assert "EvalPython" not in plan and "CartesianProduct" not in plan
