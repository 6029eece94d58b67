"""remove_dup_substrings: Lee et al. exact-substring REMOVAL — naive
reference parity, min-id canonical survival, overlapping-cut interval
merge, verbatim untouched docs, case-preserving rebuild, NULL/short
edges, and the text-shuffles-once plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup

_WS_RE = re.compile(r"[ \t\n\f\r\x0B]+")


def _toks(s):
    return [t for t in _WS_RE.split(s) if t != ""] if s is not None else None


def _naive_spans(docs, L):
    """Token-equality maximal shared runs >= L (the hash relaxation
    never collides at this size): per pair, per diagonal, walk runs."""
    ids = sorted(docs)
    out = []
    for i, a in enumerate(ids):
        ta = [t.lower() for t in _toks(docs[a]) or []]
        for b in ids[i + 1:]:
            tb = [t.lower() for t in _toks(docs[b]) or []]
            for d in range(-(len(tb) - 1), len(ta)):
                pa0, pa1 = max(0, d), min(len(ta), len(tb) + d)
                run, start = 0, None
                for pa in range(pa0, pa1 + 1):
                    if pa < pa1 and ta[pa] == tb[pa - d]:
                        if run == 0:
                            start = pa
                        run += 1
                    else:
                        if run >= L:
                            out.append((a, b, start, start - d, run))
                        run = 0
    return out


def _naive_removal(docs, L):
    cuts = {}
    for a, b, pa, pb, ln in _naive_spans(docs, L):
        cuts.setdefault(b, []).append((pb, pb + ln))
    res = {}
    for d, text in docs.items():
        if d not in cuts:
            res[d] = (text, 0)
            continue
        iv, merged = sorted(set(cuts[d])), []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        tc = _toks(text)
        kept = [t for i, t in enumerate(tc)
                if not any(s <= i < e for s, e in merged)]
        res[d] = (" ".join(kept), len(tc) - len(kept))
    return res


_SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _run(spark, docs, L=8):
    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )
    out = dedup.remove_dup_substrings(df, min_len=L)
    return {r["doc_id"]: (r["text"], r["n_removed_tokens"])
            for r in out.collect()}


def test_matches_naive_reference(spark):
    docs = {
        0: "Intro A. " + _SHARED + " tail zero unique words here",
        1: "Start " + _SHARED + " middle " + _SHARED + " B-End",
        2: _SHARED,
        3: "no overlap at all in this one truly distinct content words",
        4: "CASE Preserved " + _SHARED.upper() + " MiXeD tail",
        5: None,
        6: "short text",
        7: "x " + " ".join(f"w{i}" for i in range(20)) + " y "
           + " ".join(f"w{i}" for i in range(20)),
    }
    assert _run(spark, docs) == _naive_removal(docs, 8)


def test_min_id_holder_keeps_the_only_copy(spark):
    """A region shared by three docs survives ONLY in the smallest-id
    holder — every other holder is doc_b of at least one covering
    pair."""
    docs = {
        10: "pre10 " + _SHARED,
        11: _SHARED + " post11",
        12: "pre12a pre12b " + _SHARED,
    }
    got = _run(spark, docs)
    assert got[10] == (docs[10], 0)
    assert got[11] == ("post11", 10)
    assert got[12] == ("pre12a pre12b", 10)


def test_overlapping_cuts_merge_never_double_count(spark):
    """A victim overlapping two partners on intersecting ranges is cut
    once over the MERGED interval: 12 + 12 overlapping by 4 removes 20
    tokens, not 24."""
    w = [f"w{i}" for i in range(20)]
    docs = {
        0: " ".join(w[:12]),           # partner 1: tokens [0, 12)
        1: " ".join(w[8:]),            # partner 2: tokens [8, 20)
        2: " ".join(w),                # victim: both spans, merged [0, 20)
    }
    got = _run(spark, docs)
    assert got[0] == (docs[0], 0)
    assert got[1] == (docs[1], 0)
    assert got[2] == ("", 20)


def test_untouched_docs_keep_text_verbatim(spark):
    """No-cut documents must NOT pay the whitespace normalization —
    tabs, runs of spaces and trailing newlines survive byte-exact."""
    weird = "keep\tthese   exact\n\nbytes   intact trailing  \n"
    docs = {0: weird, 1: _SHARED + " x", 2: _SHARED + " y"}
    got = _run(spark, docs)
    assert got[0] == (weird, 0)


def test_rebuild_preserves_case_of_kept_tokens(spark):
    """Span matching is case-folded (tokens()), the rebuild is cased
    (tokens_cased): an upper-case copy is cut, and the kept tokens keep
    their original case."""
    docs = {0: "lead " + _SHARED, 1: "KeepMiXeD " + _SHARED.upper() + " TaIl"}
    got = _run(spark, docs)
    assert got[0] == (docs[0], 0)
    assert got[1] == ("KeepMiXeD TaIl", 10)


def test_null_and_short_docs_pass_through(spark):
    docs = {0: None, 1: "two words", 2: _SHARED, 3: _SHARED + " z"}
    got = _run(spark, docs)
    assert got[0] == (None, 0)
    assert got[1] == ("two words", 0)
    assert got[2] == (docs[2], 0)       # doc 2 is the min-id holder
    assert got[3] == ("z", 10)


def test_max_bucket_passes_through_to_span_side(spark):
    """Boilerplate shared by everyone is dropped by the hot-gram cap
    before it can cut anything."""
    boiler = " ".join(f"nav{i}" for i in range(10))
    docs = {i: f"u{i} " + boiler for i in range(12)}
    got = {
        r["doc_id"]: r["n_removed_tokens"]
        for r in dedup.remove_dup_substrings(
            spark.createDataFrame(
                sorted(docs.items()), "doc_id long, text string"
            ),
            min_len=8,
            max_bucket=5,
        ).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_plan_text_rides_one_join_no_cartesian(spark):
    """The gram self-join carries only (gh, doc_id, pos) and reuses the
    window count's exchange; document TEXT appears on exactly one join
    input (the rebuild). No cartesian product, no Python eval."""
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("u"), F.col("id").cast("string"), F.lit(" "),
            F.lit(" ".join(f"common{i}" for i in range(10))),
        ).alias("text"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = dedup.remove_dup_substrings(df, min_len=8)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan and "EvalPython" not in plan
