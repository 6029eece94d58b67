"""Alignment-suite tests (SURVEY.md §2.4 J5-J10, §2.5 W6).

The Spark cogroup kernel and the oracle call the SAME pure-numpy
``align_document`` — these tests verify the distributed plumbing returns
exactly the per-document algorithm's output, plus unit tests of the
assignment/pruning primitives against brute force.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from pdf_extract_spark import generator
from pdf_extract_spark.operators import align
from pdf_extract_spark.schemas import FRAGMENTS_LANG

N_DOCS = 25
SEED = 13


def brute_force_assignment(cost: np.ndarray):
    n, m = cost.shape
    k = min(n, m)
    best, best_pairs = float("inf"), None
    rows = range(n)
    for r_sub in itertools.combinations(rows, k):
        for perm in itertools.permutations(range(m), k):
            tot = sum(cost[r, c] for r, c in zip(r_sub, perm))
            if tot < best - 1e-12:
                best = tot
                best_pairs = sorted(zip(r_sub, perm))
    return best, best_pairs


@pytest.mark.parametrize("shape", [(3, 3), (4, 4), (3, 5), (5, 3), (1, 4), (6, 6)])
def test_hungarian_matches_brute_force(shape):
    rng = np.random.RandomState(7)
    for trial in range(5):
        cost = np.round(rng.rand(*shape) * 10, 3)
        pairs = align.hungarian(cost)
        total = sum(cost[r, c] for r, c in pairs)
        best, _ = brute_force_assignment(cost)
        assert len(pairs) == min(shape)
        assert total == pytest.approx(best, abs=1e-9), f"trial {trial}"


def test_monotonic_prune():
    ms = [
        {"kr_idx": 0, "en_idx": 2},
        {"kr_idx": 1, "en_idx": 1},  # regresses -> dropped
        {"kr_idx": 2, "en_idx": 3},
        {"kr_idx": 3, "en_idx": 3},  # not strictly increasing -> dropped
        {"kr_idx": 4, "en_idx": 5},
    ]
    kept = align._monotonic_prune(ms)
    assert [(m["kr_idx"], m["en_idx"]) for m in kept] == [(0, 2), (2, 3), (4, 5)]


def test_embedding_pairs_are_identical():
    kr, en = generator.make_alignment_doc(0, seed=SEED)
    # a true pair: kr text is "kr " + en text -> identical embedding
    k = align.embed_texts([kr[1]["text"]])
    e = align.embed_texts([kr[1]["text"].removeprefix("kr ")])
    assert np.allclose(k, e)


def test_align_document_matches_fixture_truth():
    """Every en P fragment's text must be matched to the kr fragment
    carrying 'kr ' + the same text (embeddings are exact for true pairs)."""
    for d in range(8):
        kr, en = generator.make_alignment_doc(d, seed=SEED)
        pairs = align.align_document(kr, en)
        kr_by_idx = {f["idx"]: f for f in kr}
        en_by_idx = {f["idx"]: f for f in en}
        p_pairs = [p for p in pairs if p["type"] == "greedy"]
        for p in p_pairs:
            kt = kr_by_idx[p["kr_idx"]]["text"].removeprefix("kr ")
            et = en_by_idx[p["en_idx"]]["text"]
            assert kt == et, f"doc {d}: mismatched P pair"
        # headers: every en header should be matched (sim == 1 pairs exist)
        n_en_h = sum(1 for f in en if f["source_type"] != "P")
        n_h_matched = sum(1 for p in pairs if p["type"] != "greedy")
        assert n_h_matched >= n_en_h - 1  # monotonic prune may drop at most edges


def test_spark_align_equals_oracle(spark):
    kr_rows, en_rows = [], []
    for d in range(N_DOCS):
        kr, en = generator.make_alignment_doc(d, seed=SEED)
        kr_rows.extend(kr)
        en_rows.extend(en)
    kr_df = spark.createDataFrame(kr_rows, schema=FRAGMENTS_LANG)
    en_df = spark.createDataFrame(en_rows, schema=FRAGMENTS_LANG)

    got = {}
    for r in align.align_pairs(kr_df, en_df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["kr_idx"], r["en_idx"], r["similarity"], r["type"])
        )
    for v in got.values():
        v.sort()

    expected = {}
    for d in range(N_DOCS):
        kr, en = generator.make_alignment_doc(d, seed=SEED)
        doc_id = kr[0]["doc_id"]
        expected[doc_id] = sorted(
            (p["kr_idx"], p["en_idx"], p["similarity"], p["type"])
            for p in align.align_document(kr, en)
        )
    assert got == expected


def test_exports(spark):
    kr, en = generator.make_alignment_doc(0, seed=SEED)
    kr_df = spark.createDataFrame(kr, schema=FRAGMENTS_LANG)
    en_df = spark.createDataFrame(en, schema=FRAGMENTS_LANG)
    pairs = align.align_pairs(kr_df, en_df)

    anchored = align.export_kr_anchored(kr_df, pairs, en_df)
    assert anchored.count() == len(kr)  # every kr row survives the left join

    fo = align.export_full_outer(kr_df, pairs, en_df).collect()
    # full outer: all kr rows + all en rows appear at least once
    assert {r["kr_idx"] for r in fo if r["kr_idx"] is not None} == {f["idx"] for f in kr}
    assert {r["en_idx"] for r in fo if r["en_idx"] is not None} == {f["idx"] for f in en}


def test_export_en_anchored_mirrors_kr(spark):
    """J3 en-side export (create_csv.py:124-199): one row per en
    fragment; matched rows carry kr info; consistency with the kr-
    anchored and full-outer exports."""
    kr, en = generator.make_alignment_doc(0, seed=SEED)
    kr_df = spark.createDataFrame(kr, schema=FRAGMENTS_LANG)
    en_df = spark.createDataFrame(en, schema=FRAGMENTS_LANG)
    pairs = align.align_pairs(kr_df, en_df)
    en_anch = align.export_en_anchored(kr_df, pairs, en_df)

    assert en_anch.count() == en_df.count()  # every en fragment exactly once
    matched = en_anch.filter("kr_idx IS NOT NULL")
    # matched rows agree with the pair list
    got_pairs = {(r["doc_id"], r["kr_idx"], r["en_idx"]) for r in matched.collect()}
    exp_pairs = {(r["doc_id"], r["kr_idx"], r["en_idx"]) for r in pairs.collect()}
    assert got_pairs == exp_pairs
    # the en-anchored view equals the full outer restricted to en rows
    fo = align.export_full_outer(kr_df, pairs, en_df).filter("en_idx IS NOT NULL")
    assert fo.count() == en_anch.count()


def test_zip_match_pairs_in_index_order():
    """J10 unit pin (aligner.py:432-440): i-th kr P <-> i-th en P, sorted
    by idx, extra items on the longer side unpaired."""
    kr = [{"idx": 5, "text": "k2"}, {"idx": 1, "text": "k0"}, {"idx": 3, "text": "k1"}]
    en = [{"idx": 2, "text": "e0"}, {"idx": 4, "text": "e1"}]
    got = align.zip_match(kr, en)
    assert got == [
        {"kr_idx": 1, "en_idx": 2, "similarity": None, "type": "zip"},
        {"kr_idx": 3, "en_idx": 4, "similarity": None, "type": "zip"},
    ]
