"""ngram_topk (corpus boilerplate miner) and temperature_sample
(corpus-derived multilingual mixing) — kernel semantics vs pure-Python
models, determinism, and the plan shapes their 100 TB story rests on.
The DuckDB oracle twins are value+dtype-checked by test_entry /
test_dtype_gate like every registered query; these tests pin behavior
the oracles can't see (tie determinism across reruns, plan shape,
validation errors)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup, textstats


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- fixtures

DOCS = [
    (1, "the cookie banner asks for consent", "en"),
    (2, "the cookie banner asks for consent", "en"),
    (3, "the cookie banner asks for consent", "en"),
    (4, "fresh unique prose about gardens and rain", "en"),
    (5, "more unique prose about trains", "de"),
    (6, "tiny", "de"),          # < k tokens: single whole-text shingle
    (7, "", "fr"),              # empty: shingle '' — mined never
    (8, None, "fr"),            # NULL text
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _py_doc_freq(texts, k):
    """Pure-Python model: document frequency of distinct word k-grams."""
    c = Counter()
    for t in texts:
        toks = [w for w in (t or "").lower().split() if w]
        if len(toks) >= k:
            grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        else:
            grams = {" ".join(toks)}
        c.update(g for g in grams if g != "")
    return c


# -------------------------------------------------------------- ngram_topk

def test_ngram_topk_matches_python_model(spark):
    got = {
        (r["gram"], r["n_docs"])
        for r in dedup.ngram_topk(_docs(spark), k=3, top=100, min_docs=1).collect()
    }
    want = set(_py_doc_freq([t for _, t, _ in DOCS], 3).items())
    assert got == want


def test_ngram_topk_min_docs_and_boundary_determinism(spark):
    # the planted triple-doc grams all tie at n_docs=3; top=2 cuts inside
    # the tie group -> the 2 lexicographically smallest grams, every run
    runs = [
        [tuple(r) for r in dedup.ngram_topk(_docs(spark), k=3, top=2, min_docs=2).collect()]
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    grams = [g for g, _ in runs[0]]
    tied = sorted(g for g, n in _py_doc_freq([t for _, t, _ in DOCS], 3).items() if n == 3)
    assert grams == tied[:2]
    assert all(n == 3 for _, n in runs[0])


def test_ngram_topk_validation(spark):
    with pytest.raises(ValueError):
        dedup.ngram_topk(_docs(spark), k=0)
    with pytest.raises(ValueError):
        dedup.ngram_topk(_docs(spark), top=0)


def test_ngram_topk_plan_is_heap_topk_not_window(spark):
    """The global top-N must compile to TakeOrderedAndProject (bounded
    per-partition heap, O(top) driver memory) — never a single-partition
    sort or a window, which would funnel the whole distinct-gram
    relation through one task at corpus scale."""
    plan = _plan(dedup.ngram_topk(_docs(spark), k=3, top=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    # map-side combine on the gram key before its only shuffle
    assert "partial_count" in plan, plan


# ---------------------------------------------------------- length stats

def test_length_quantiles_exact_matches_python(spark):
    import statistics

    rows = [(i, "en" if i < 7 else "de", v) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6, 5, 3])]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {r["lang"]: (r["q25"], r["q50"], r["q75"], r["n"]) for r in textstats.length_quantiles(df).collect()}
    for lang, vals in (("en", [3, 1, 4, 1, 5, 9, 2]), ("de", [6, 5, 3])):
        q = statistics.quantiles(sorted(vals), n=4, method="inclusive")
        assert got[lang] == (q[0], q[1], q[2], len(vals)), (lang, got[lang], q)


def test_length_quantiles_approx_within_tolerance_and_mergeable(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {r["lang"]: r["q50"] for r in textstats.length_quantiles(docs).collect()}
    approx = {
        r["lang"]: r["q50"]
        for r in textstats.length_quantiles(docs, relative_error=0.01).collect()
    }
    for lang, e in exact.items():
        assert abs(approx[lang] - e) / max(e, 1.0) < 0.1, (lang, e, approx[lang])
    # the sketch path must stay a partial-combinable aggregate
    plan = _plan(textstats.length_quantiles(docs, relative_error=0.01))
    assert "partial_approx_percentile" in plan, plan


def test_length_quantiles_validation(spark):
    df = spark.createDataFrame([(1, "en", 2)], "doc_id long, lang string, n_chars long")
    with pytest.raises(ValueError):
        textstats.length_quantiles(df, probs=())
    with pytest.raises(ValueError):
        textstats.length_quantiles(df, probs=(1.5,))


# -------------------------------------------------------------- dedup_media

def test_dedup_media_groups_identical_payloads(spark):
    from pdf_extract_spark.operators import multimodal as M

    rows = [
        ("m:1", bytes([1, 2, 3])),
        ("m:2", bytes([1, 2, 3])),
        ("m:10", bytes([1, 2, 3])),  # 'm:1' < 'm:10' < 'm:2' binary min
        ("m:3", bytes([9, 9])),
    ]
    df = spark.createDataFrame(rows, "media_ref string, content binary")
    got = {r["keeper_ref"]: r["n_dups"] for r in M.dedup_media(df).collect()}
    assert got == {"m:1": 3, "m:3": 1}


def test_dedup_media_plan_is_single_partial_aggregate(spark):
    from pdf_extract_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [("m:1", bytes([1]))], "media_ref string, content binary"
    )
    plan = _plan(M.dedup_media(df))
    assert "partial_min" in plan and "partial_count" in plan, plan
    assert "Window" not in plan, plan


# ---------------------------------------------------- exact_dedup_keepbest

def test_keepbest_picks_highest_score_then_smallest_id(spark):
    rows = [
        (10, "same page", 50),
        (3, "same page", 400),   # highest score -> keeper despite id 3 > ...
        (1, "same page", 400),   # ... tie at 400 -> smallest id 1 wins
        (7, "other page", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    got = {
        r["keeper_id"]: (r["best_score"], r["n_dups"])
        for r in dedup.exact_dedup_keepbest(df).collect()
    }
    assert got == {1: (400, 3), 7: (10, 1)}


def test_keepbest_normalizes_text_like_exact_dedup(spark):
    # whitespace/case variants are the SAME page (norm_text semantics)
    rows = [(1, "Same  Page", 5), (2, "same page", 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = dedup.exact_dedup_keepbest(df).collect()
    assert len(out) == 1 and out[0]["keeper_id"] == 2 and out[0]["n_dups"] == 2


def test_keepbest_plan_is_aggregate_not_window(spark):
    df = spark.createDataFrame(
        [(1, "a", 1)], "doc_id long, text string, n_chars long"
    )
    plan = _plan(dedup.exact_dedup_keepbest(df))
    assert "partial_min" in plan, plan    # map-side combine of the argmax
    assert "Window" not in plan, plan


# ------------------------------------------------------ temperature_sample

def _py_keep(doc_id, rate, salt="temp"):
    h = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16)
    return (h % textstats.SAMPLE_MOD) < rate * textstats.SAMPLE_MOD


def test_temperature_alpha_one_keeps_everything(spark):
    d = _docs(spark)
    assert textstats.temperature_sample(d, alpha=1.0).count() == d.count()


def test_temperature_smallest_stratum_keeps_all(spark):
    # de/fr are tied smallest (2 docs each): rate exactly 1.0, and
    # h < 1.0 * SAMPLE_MOD always holds since h is in [0, SAMPLE_MOD)
    kept = textstats.temperature_sample(_docs(spark), alpha=0.5)
    for lang, n in (("de", 2), ("fr", 2)):
        assert kept.filter(F.col("lang") == lang).count() == n


def test_temperature_matches_python_model(spark):
    counts = Counter(lang for _, _, lang in DOCS)
    nmin = min(counts.values())
    kept = {
        r["doc_id"]
        for r in textstats.temperature_sample(_docs(spark), alpha=0.5).collect()
    }
    want = {
        doc_id
        for doc_id, _, lang in DOCS
        if _py_keep(doc_id, round((nmin / counts[lang]) ** 0.5, 6))
    }
    assert kept == want


def test_temperature_flattens_shares(spark, ddb):
    """On the real corpus the dominant stratum's share must shrink and
    every stratum must retain rows — the mixing rule's whole point."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {
        r["lang"]: r["n"]
        for r in textstats.temperature_sample(docs, alpha=0.5)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(after) == set(before)
    tot_b, tot_a = sum(before.values()), sum(after.values())
    top = max(before, key=before.get)
    assert after[top] / tot_a < before[top] / tot_b
    small = min(before, key=before.get)
    assert after[small] == before[small]  # rate 1.0 keeps every row


def test_temperature_preserves_columns_and_is_rerun_stable(spark):
    d = _docs(spark)
    k1 = textstats.temperature_sample(d, alpha=0.5)
    assert k1.columns == d.columns
    ids = sorted(r["doc_id"] for r in k1.collect())
    assert ids == sorted(r["doc_id"] for r in textstats.temperature_sample(d, alpha=0.5).collect())


def test_temperature_validation(spark):
    with pytest.raises(ValueError):
        textstats.temperature_sample(_docs(spark), alpha=0.0)
    with pytest.raises(ValueError):
        textstats.temperature_sample(_docs(spark), alpha=1.5)


def test_temperature_plan_broadcasts_rates_never_shuffles_corpus(spark):
    """The rate table (one row per stratum) must reach the corpus via a
    broadcast join; the corpus side must not be exchanged — its only
    operations are the joined filter and the projection."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.temperature_sample(docs, alpha=0.5))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the only Exchanges sit on the stratum-counts subtree (bounded by
    # stratum cardinality); verify none is a repartition of the corpus
    # by checking every Exchange feeds an aggregate, not the probe scan
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning(doc_id" in line:
            raise AssertionError(f"corpus shuffled: {line}")


def test_upsample_mix_epoch_semantics(spark):
    """weight 2.5: every row at epochs 0,1 and a deterministic subset at
    epoch 2; weight 0 removes the stratum; default 1.0 emits epoch 0
    only; reruns emit the identical row set."""
    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else ("zh" if i % 4 == 1 else "fr"))
         for i in range(200)],
        "doc_id long, lang string",
    )
    w = {"en": 2.5, "zh": 0.0}
    out = textstats.upsample_mix(df, w).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert not any(r["lang"] == "zh" for r in out)
    en_docs = [d for d in by_doc if d % 2 == 0]
    for d in en_docs:
        eps = sorted(by_doc[d])
        assert eps in ([0, 1], [0, 1, 2])  # 2 full epochs + maybe frac
    frac = sum(1 for d in en_docs if len(by_doc[d]) == 3) / len(en_docs)
    assert 0.3 < frac < 0.7  # ~0.5 of en docs get the third epoch
    for d in (d for d in by_doc if d % 4 == 3):  # fr default 1.0
        assert by_doc[d] == [0]
    rerun = textstats.upsample_mix(df, w).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == sorted(
        (r["doc_id"], r["epoch"]) for r in rerun
    )


def test_upsample_mix_validation_and_plan(spark):
    """Negative weights raise; the plan is map-only: zero Exchange, no
    Python eval — the weight table folds into the plan as a CASE."""
    import pytest

    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame([(0, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        textstats.upsample_mix(df, {"en": -0.1})
    with pytest.raises(ValueError):
        textstats.upsample_mix(df, {}, default_weight=-1.0)
    plan = (
        textstats.upsample_mix(df, {"en": 1.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_ex = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_ex == 0 and "EvalPython" not in plan


def test_upsample_mix_null_key_and_integer_weights(spark):
    """NULL key rows get exactly floor(weight) epochs (no fractional
    copy — nothing to hash) in BOTH engines; an all-integer weight
    table skips the per-row hash entirely (no md5 in the plan)."""
    import duckdb

    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame(
        [(None, "en"), (1, "en"), (None, "fr")],
        "doc_id long, lang string",
    )
    w = {"en": 2.5}
    out = textstats.upsample_mix(df, w).collect()
    null_en = sorted(r["epoch"] for r in out if r["doc_id"] is None and r["lang"] == "en")
    assert null_en == [0, 1]  # floor(2.5) epochs, never the fractional third
    assert sorted(r["epoch"] for r in out if r["lang"] == "fr") == [0]
    # twin agreement on NULL keys
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES (NULL::BIGINT, 'en'),"
        " (1::BIGINT, 'en'), (NULL::BIGINT, 'fr')) v(doc_id, lang)"
    )
    sql_rows = con.sql(
        "SELECT lang, epoch FROM ("
        + textstats.upsample_mix_sql(w, table="t")
        + ")"
    ).fetchall()
    assert sorted(sql_rows) == sorted(
        (r["lang"], r["epoch"]) for r in out
    )
    # integer weights -> constant-false fractional term -> no hash
    plan = (
        textstats.upsample_mix(df, {"en": 2.0, "fr": 3.0})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "md5" not in plan


def test_quality_buckets_null_stratum_kept(spark):
    """Docs whose stratum is NULL are kept with a NULL bucket (no
    thresholds apply) — not silently dropped by the threshold join."""
    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame(
        [(0, "the cat", "en"), (1, "the cat", "en"), (2, "the cat", None)],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in textstats.quality_buckets(df).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[2]["bucket"] is None
    assert rows[2]["milli_bits_per_token"] is not None  # scored, unbucketed
    assert rows[0]["bucket"] is not None


def test_sketch_accuracy_validation(spark):
    import pytest

    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame([(0, "a", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        textstats.quality_buckets(df, relative_error=0.0)
    with pytest.raises(ValueError):
        textstats.quality_buckets(df, relative_error=-0.5)
    with pytest.raises(ValueError):
        textstats.length_quantiles(df.withColumnRenamed("doc_id", "n_chars"),
                                   relative_error=0.0)


def test_chunk_documents_preserves_case(spark):
    from pdf_extract_spark.operators import packing

    df = spark.createDataFrame(
        [(0, "The CEO met NASA")], "doc_id long, text string"
    )
    rows = packing.chunk_documents(df, window=3, stride=3).collect()
    assert [r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"])] == [
        "The CEO met", "NASA",
    ]
