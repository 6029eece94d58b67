"""repetition_stats edge semantics: NULL text must yield NULL for ALL
three stats (not a mixed NULL/0.0 row), and degenerate token arrays must
not turn into runtime slice errors."""

from __future__ import annotations

from pdf_extract_spark.operators import textstats


def test_repetition_stats_null_and_degenerate(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "one"), (2, "a a b a b")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}

    null_row = rows[0]
    assert null_row["n_tokens"] is None
    assert null_row["type_token_ratio"] is None
    assert null_row["top_bigram_frac"] is None  # was 0.0 pre-fix

    one = rows[1]  # single token: no bigrams -> 0.0, not NULL/error
    assert one["n_tokens"] == 1
    assert one["type_token_ratio"] == 1.0
    assert one["top_bigram_frac"] == 0.0

    rep = rows[2]  # bigrams: [a a, a b, b a, a b] -> top 'a b' 2/4
    assert rep["n_tokens"] == 5
    assert rep["type_token_ratio"] == 0.4
    assert rep["top_bigram_frac"] == 0.5


def test_tokens_twins_agree_on_vertical_tab(spark):
    """Java's \\s includes \\x0B, RE2's does not — the explicit WS class
    must make tokens()/tokens_sql() (and everything downstream:
    token_count, norm_text-keyed dedup) byte-identical across engines on
    vertical-tab-bearing text."""
    import duckdb

    from pdf_extract_spark.operators import dedup

    rows = [
        (0, "a\x0bb c"),          # the divergence repro: \s vs explicit class
        (1, "a \t\n\f\r b"),      # every ASCII ws member
        (2, "plain words here"),
        (3, "x\x0b\x0by"),        # run of vertical tabs
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got_tok = {
        r["doc_id"]: (r["n_tokens"], r["n_subwords"])
        for r in textstats.token_count(sdf).collect()
    }
    got_hash = {
        r["text_hash"]: (r["keeper_id"], r["n_dups"])
        for r in dedup.exact_dedup(sdf).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    from pdf_extract_spark.queries import ORACLES

    want_tok = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLES["token_count"]).fetchall()
    }
    want_hash = {
        r[0]: (r[1], r[2])
        for r in con.execute(dedup.exact_dedup_sql()).fetchall()
    }
    assert got_tok == want_tok
    assert got_hash == want_hash


def test_pack_documents_null_text_counts_zero(spark):
    """A NULL-text doc must pack as 0 tokens in BOTH engines — the NaN
    it previously produced disabled the budget check for the rest of the
    bucket (cum + NaN > budget is always False)."""
    import duckdb

    from pdf_extract_spark.operators import packing

    rows = [(i, None if i == 2 else "w " * 50) for i in range(8)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["bucket"], r["pack_id"], r["n_tokens"])
        for r in packing.pack_documents(sdf, budget=128, n_buckets=2).collect()
    }
    assert got[2][2] == 0

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            packing.pack_documents_sql(budget=128, n_buckets=2)
        ).fetchall()
    }
    assert got == want


def test_tokens_edge_whitespace_no_phantom_tokens(spark):
    """'\\n'-terminated or padded text must not count a phantom ''
    token (trim strips only 0x20); whitespace-only text has ZERO tokens
    and the ratio stats agree cross-engine on the 0/0 case (NULL)."""
    import duckdb

    rows = [
        (0, "hello world\n"),
        (1, "\t padded both ends \r\n"),
        (2, "   \n\t  "),       # whitespace-only: 0 tokens
        (3, "one"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in textstats.token_count(sdf).collect()}
    assert got == {0: 2, 1: 3, 2: 0, 3: 1}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: r[1]
            for r in con.execute(textstats.token_count_sql()).fetchall()}
    assert got == want

    qs = {r["doc_id"]: r["stopword_ratio"]
          for r in textstats.quality_score(sdf).collect()}
    qo = {r[0]: r[3] for r in con.execute(  # col 3 = stopword_ratio
        textstats.quality_score_sql()).fetchall()}
    assert qs[2] is None and qo[2] is None  # 0/0 -> NULL in BOTH engines
    assert qs == qo


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token is covered, consecutive chunks overlap by
    window - stride, the tail chunk may be short, and zero-token docs
    (empty/NULL) yield no chunks. Validation rejects bad stride."""
    import pytest

    from pdf_extract_spark.operators import packing

    text = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame(
        [(0, text), (1, ""), (2, None), (3, "a b")],
        "doc_id long, text string",
    )
    rows = sorted(
        packing.chunk_documents(df, window=8, stride=6).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 3}  # empty/NULL docs chunkless
    chunks0 = [r["chunk_text"].split(" ") for r in by_doc[0]]
    # starts 0,6,12,18 over 20 tokens: sizes 8,8,8,2
    assert [len(c) for c in chunks0] == [8, 8, 8, 2]
    # consecutive overlap = window - stride = 2
    for a, b in zip(chunks0, chunks0[1:]):
        assert a[-2:] == b[:2]
    # full coverage in order
    flat = chunks0[0] + [t for c in chunks0[1:] for t in c[2:]]
    assert flat == text.split(" ")
    assert [r["chunk_text"] for r in by_doc[3]] == ["a b"]

    with pytest.raises(ValueError):
        packing.chunk_documents(df, window=8, stride=9)
    with pytest.raises(ValueError):
        packing.chunk_documents(df, window=0)
    with pytest.raises(ValueError):
        packing.chunk_documents(df, window=8, stride=0)


def test_chunk_documents_plan_is_map_only(spark):
    from pyspark.sql import functions as F

    from pdf_extract_spark.operators import packing

    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.lit("one two three four five six").alias("text"),
    )
    plan = (
        packing.chunk_documents(df, window=4, stride=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_ex = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_ex == 0 and "EvalPython" not in plan


def test_vocab_coverage_oov_and_edges(spark):
    """vocab_coverage: OOV counts against the derived top-V vocabulary;
    NULL text -> all NULL, empty text -> zero tokens with NULL rate."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "common words appear here"),
            (2, "common words appear here too"),
            (3, "zzz qqq xxx"),          # rare: out of a small vocab
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           textstats.vocab_coverage(df, vocab_size=4).collect()}
    # vocab (df desc, term asc, V=4): appear/common/here/words (df=2 each
    # beats every df=1 term; ties inside df=2 broken by term asc)
    assert out[1].n_oov == 0 and out[1].oov_milli == 0
    assert out[2].n_oov == 1                       # 'too' is OOV
    assert out[2].oov_milli == 1000 // 5
    assert out[3].n_oov == 3 and out[3].oov_milli == 1000
    assert all(v is None for k, v in out[4].asDict().items() if k != "doc_id")
    assert out[5].n_tokens == 0 and out[5].oov_milli is None


def test_vocab_coverage_plan_broadcasts_vocab(spark):
    """The bounded vocab must reach the occurrence join as a broadcast
    (the corpus side never shuffles by term) and the top-V must compile
    to TakeOrderedAndProject, not a global sort."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textstats.vocab_coverage(docs, vocab_size=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_script_profile_hand_computed(spark):
    """Mixed-script document: counts by class, trunc-milli fractions,
    NULL/empty edges."""
    df = spark.createDataFrame(
        [
            (1, "ab 12 한글 中文 яз"),   # 2 latin, 2 digit, 2 hangul, 2 cjk, 2 cyr, 4 spaces = 14
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           textstats.script_profile(df).collect()}
    r = out[1]
    assert r.n_chars == 14
    for col in ("latin_milli", "digit_milli", "hangul_milli",
                "cjk_milli", "cyrillic_milli"):
        assert getattr(r, col) == 2 * 1000 // 14
    assert r.other_milli == 4 * 1000 // 14
    assert all(v is None for k, v in out[2].asDict().items() if k != "doc_id")
    assert out[3].n_chars == 0 and out[3].latin_milli is None


def test_script_profile_plan_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textstats.script_profile(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_split_assign_deterministic_and_growth_stable(spark):
    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string")
    out = textstats.split_assign(df).collect()
    assert len(out) == 300
    assert all(r.split in ("train", "val", "test") for r in out)
    assert all(0 <= r.split_bucket < 10000 for r in out)
    # rerun = identical assignment (hash, not random)
    again = {r.doc_id: r.split for r in textstats.split_assign(df).collect()}
    assert all(again[r.doc_id] == r.split for r in out)
    # growth stability: a 600-doc superset assigns the original 300
    # docs identically — held-out membership never leaks on re-ingest
    big = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(600)], "doc_id long, text string")
    grown = {r.doc_id: r.split for r in textstats.split_assign(big).collect()}
    assert all(grown[r.doc_id] == r.split for r in out)


def test_split_assign_validates_fractions(spark):
    import pytest
    from pdf_extract_spark.operators import textstats

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.split_assign(df, fractions=(("train", 9000), ("val", 100)))
    with pytest.raises(ValueError):
        textstats.split_assign_sql(fractions=(("train", 9000), ("val", 200)))


def test_split_assign_plan_map_only(spark):
    from pdf_extract_spark.operators import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (textstats.split_assign(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_bpe_pair_counts_hand_computed(spark):
    """Pair counts weight by word frequency; single-char words
    contribute nothing; case is preserved; NULL/empty text drop out."""
    df = spark.createDataFrame(
        [
            (1, "aab aab ab"),   # 'aab' n=2 -> aa:2, ab:2 ; 'ab' n=1 -> ab:1
            (2, "a Ab"),         # 'a' len 1 -> no pairs; 'Ab' cased, distinct from 'ab'
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = textstats.bpe_pair_counts(df, top=10).collect()
    got = {r.pair: (r.n_pairs, r.rank) for r in rows}
    # totals: ab=3, aa=2, Ab=1 — order (n desc, pair asc); note 'Ab' < 'aa'
    # in binary UTF-8 so at n=1 it would sort before lowercase pairs
    assert got == {"ab": (3, 1), "aa": (2, 2), "Ab": (1, 3)}


def test_bpe_pair_counts_weighting_is_per_occurrence(spark):
    # the same word in two documents counts twice: frequency weighting,
    # not document frequency
    df = spark.createDataFrame(
        [(1, "xy"), (2, "xy"), (3, "zz zz zz")],
        "doc_id long, text string",
    )
    got = {r.pair: r.n_pairs for r in
           textstats.bpe_pair_counts(df, top=5).collect()}
    assert got == {"xy": 2, "zz": 3}


def test_bpe_pair_counts_top_rejects_bad_arg(spark):
    import pytest

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.bpe_pair_counts(df, top=0)


def test_bpe_pair_counts_plan_heap_topk_no_python(spark):
    """The top-N must compile to TakeOrderedAndProject (bounded heap);
    the rank window runs AFTER the limit, over `top` rows; no Python."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (textstats.bpe_pair_counts(docs, top=40)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


# --------------------------------------------------- pmi_collocations

def test_pmi_planted_pair_ranks_first_and_hapax_pruned(spark):
    from pdf_extract_spark.operators import textstats

    rows = (
        # filler words are unique per doc, so every filler pair is a
        # hapax and min_count prunes it
        [(i, f"alpha beta x{i} y{i}") for i in range(10)]
        # the exclusive pair: strong/collocation NEVER appear apart
        + [(100 + i, "strong collocation") for i in range(5)]
        # alpha and beta ALSO appear apart, diluting their lift below
        # the exclusive pair's; 'hapax unicum' appears exactly once
        + [(200, "alpha solo and beta apart hapax unicum")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.pmi_collocations(df, top=50, min_count=2).collect()
    pairs = {(r["w1"], r["w2"]): r for r in out}
    assert ("hapax", "unicum") not in pairs           # min_count gate
    # 'strong collocation' only ever appears as the pair -> top lift
    top1 = min(out, key=lambda r: r["rank"])
    assert (top1["w1"], top1["w2"]) == ("strong", "collocation")
    # ranks are 1..n dense and ordered by milli_lift desc
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    lifts = [r["milli_lift"] for r in sorted(out, key=lambda r: r["rank"])]
    assert lifts == sorted(lifts, reverse=True)


def test_pmi_plan_heap_topk_vocab_not_broadcast(spark):
    from pdf_extract_spark.operators import textstats

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.createDataFrame(
            [(i, "one two three four five one two") for i in range(8)],
            "doc_id long, text string",
        )
        out = textstats.pmi_collocations(df, top=5, min_count=2)
        out.collect()
        full = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    i, j = full.find("== Final Plan =="), full.find("== Initial Plan ==")
    final = full[i:j] if 0 <= i < j else full
    # global top-N is a heap, never a full sort of the pair space
    assert "TakeOrderedAndProject" in final, final
    # the ONLY broadcast is the single-row corpus total: the unigram
    # vocabulary joins stay shuffle joins at scale
    assert final.count("BroadcastExchange") == 1, final


# -------------------------------------------------------- skew_stats

def test_skew_stats_extremes_and_hand_check(spark):
    from pdf_extract_spark.operators import textstats

    # perfectly even: 4 keys x 3 rows -> gini 0, top share = 1/4
    even = spark.createDataFrame(
        [(f"k{i % 4}",) for i in range(12)], "key string"
    )
    (r,) = textstats.skew_stats(even).collect()
    assert (r["n_rows"], r["n_keys"], r["milli_gini"]) == (12, 4, 0)
    assert r["top1_share_milli"] == 250 and r["p50_count"] == 3

    # maximal skew: one key owns 99 of 100 rows
    skew = spark.createDataFrame(
        [("big",)] * 99 + [("small",)], "key string"
    )
    (r,) = textstats.skew_stats(skew).collect()
    assert r["hot_key"] == "big" and r["top1_share_milli"] == 990
    # G for sizes [1, 99]: (2*(1*1 + 2*99) - 3*100) / (2*100) = 0.49
    assert r["milli_gini"] == 490

    # single key: gini undefined -> NULL, not a division error
    one = spark.createDataFrame([("k",)] * 5, "key string")
    (r,) = textstats.skew_stats(one).collect()
    assert r["milli_gini"] is None and r["max_count"] == 5

    # hand-check an uneven distribution against the naive O(n^2) sum
    import itertools

    sizes = [1, 1, 2, 3, 5, 8, 13]
    rows = [(f"k{i}",) for i, s in enumerate(sizes) for _ in range(s)]
    df = spark.createDataFrame(rows, "key string")
    (r,) = textstats.skew_stats(df).collect()
    n, t = len(sizes), sum(sizes)
    naive = sum(abs(a - b) for a, b in itertools.product(sizes, sizes))
    assert r["milli_gini"] == naive * 1000 // (2 * n * t)


# ------------------------------------------------------ lang_segments

def test_lang_segments_runs_merge_and_plan(spark):
    from pdf_extract_spark.operators import textstats

    rows = [
        # en, en, de, de, fr -> three segments with merged runs
        (1, "the cat of the house\nand a dog of note\n"
            "der hund ist und das\ndie katze und der ist\nle chat et la"),
        # single line -> one segment
        (2, "the of and"),
        # empty text -> one empty line: zero tokens, zero-hit tie ->
        # first language code (the documented lang_id tie contract)
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.lang_segments(df).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["seg_no"])):
        by_doc.setdefault(r["doc_id"], []).append(
            (r["seg_lang"], r["n_lines"], r["n_tokens"]))
    assert by_doc[1] == [("en", 2, 10), ("de", 2, 10), ("fr", 1, 4)]
    assert by_doc[2] == [("en", 1, 3)]
    assert by_doc[3] == [("de", 1, 0)]
    # seg_no is dense from 0 per doc
    for segs in by_doc.values():
        assert len(segs) >= 1

    # every window partitions by doc_id: no corpus-wide (empty
    # partition-spec) window anywhere in the plan
    plan = (
        textstats.lang_segments(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"Window \[", plan):
        frag = plan[m.start():m.start() + 400]
        assert "doc_id" in frag.split("windowspecdefinition")[1][:120], frag


def test_skew_top_keys_ranking_and_plan(spark):
    from pdf_extract_spark.operators import textstats

    rows = ([("big",)] * 6 + [("mid",)] * 3 + [("a",)] * 1 + [("b",)] * 1)
    df = spark.createDataFrame(rows, "key string")
    out = sorted(textstats.skew_top_keys(df, top=3).collect(),
                 key=lambda r: r["rank"])
    assert [(r["key"], r["c"], r["share_milli"]) for r in out] == [
        ("big", 6, 545), ("mid", 3, 272), ("a", 1, 90)]  # tie a<b, top=3
    plan = (textstats.skew_top_keys(df, top=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan, plan  # heap, never a full sort
