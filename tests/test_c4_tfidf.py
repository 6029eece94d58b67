"""C4 cleaning + tf-idf keyword units (the oracle gates in
test_entry/test_dtype_gate cover sf0.01 exactness; these pin the rule
semantics on crafted rows where each predicate fires alone)."""

from __future__ import annotations

from pdf_extract_spark.operators import textstats

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


GOOD = "This sentence is easily long enough to keep."     # kept line
SHORT = "Too short."                                       # < 5 words
NOTERM = "five words but no terminal mark here"            # no terminal
JS = "Please enable JavaScript to continue reading now."   # javascript


def test_c4_line_rules(spark):
    docs = spark.createDataFrame(
        [
            ("keep3", "\n".join([GOOD, GOOD, GOOD])),
            ("only2", "\n".join([GOOD, GOOD, SHORT])),
            ("jsline", "\n".join([GOOD, GOOD, GOOD, JS])),
            ("noterm", "\n".join([GOOD, NOTERM, GOOD, GOOD])),
        ],
        "doc_id string, text string",
    )
    out = _rows(textstats.c4_clean(docs))
    assert out["keep3"]["keep"] and out["keep3"]["n_kept"] == 3
    assert out["keep3"]["cleaned_text"] == "\n".join([GOOD, GOOD, GOOD])
    # two survivors < min_lines=3 -> page dropped, cleaned NULL
    assert not out["only2"]["keep"] and out["only2"]["cleaned_text"] is None
    # the javascript LINE is dropped, the page survives on the other 3
    assert out["jsline"]["keep"] and out["jsline"]["n_kept"] == 3
    assert "JavaScript" not in out["jsline"]["cleaned_text"]
    assert out["noterm"]["n_kept"] == 3 and out["noterm"]["keep"]


def test_c4_page_rules(spark):
    docs = spark.createDataFrame(
        [
            ("brace", "\n".join([GOOD, GOOD, GOOD, "x = { 1 }"])),
            ("lorem", "\n".join([GOOD, GOOD, GOOD, "More Lorem Ipsum filler text here."])),
            ("blocked", "\n".join([GOOD, GOOD, GOOD, "A planted SPAM marker sentence appears here."])),
            ("clean", "\n".join([GOOD, GOOD, GOOD])),
            ("nulltext", None),
        ],
        "doc_id string, text string",
    )
    out = _rows(textstats.c4_clean(docs, blocklist=("planted spam marker",)))
    assert not out["brace"]["keep"]          # '{' anywhere kills the page
    assert not out["lorem"]["keep"]          # case-insensitive lorem ipsum
    assert not out["blocked"]["keep"]        # case-insensitive blocklist
    assert out["clean"]["keep"]
    # NULL text coalesces to '': one empty pseudo-line, nothing kept
    assert out["nulltext"]["n_lines"] == 1 and out["nulltext"]["n_kept"] == 0
    assert not out["nulltext"]["keep"]


def test_c4_terminal_variants_and_rtrim(spark):
    quote = 'He said this quoted sentence would be kept."'
    curly = "A curly-quoted sentence should also be kept”"
    padded = GOOD + "   "          # space-rtrim reaches the '.'
    tabbed = GOOD + "\t"           # rtrim is space-only: tab blocks it
    docs = spark.createDataFrame(
        [("d", "\n".join([quote, curly, padded, tabbed]))],
        "doc_id string, text string",
    )
    out = _rows(textstats.c4_clean(docs))["d"]
    assert out["n_kept"] == 3
    assert tabbed not in out["cleaned_text"]


def test_tfidf_scores_and_ranks(spark):
    # 'common' is in all 4 docs -> idf bits = flog2(4//4) = 0 -> score 0;
    # 'rare' in 1 of 4 -> flog2(4) = 2 bits; tf=2 -> score 4.
    docs = spark.createDataFrame(
        [
            ("a", "common rare rare alpha"),
            ("b", "common beta"),
            ("c", "common beta"),
            ("d", "common"),
        ],
        "doc_id string, text string",
    )
    out = textstats.tfidf_topk(docs, top=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    a = {r["term"]: r for r in by_doc["a"]}
    assert a["rare"]["score"] == 4 and a["rare"]["rnk"] == 1
    assert a["alpha"]["score"] == 2      # tf=1 * flog2(4//1)=2
    assert "common" not in a             # score 0 loses both slots
    # doc d has only the ubiquitous term: still emitted (rank 1, score 0)
    assert by_doc["d"][0]["term"] == "common" and by_doc["d"][0]["score"] == 0
    assert all(len(v) <= 2 for v in by_doc.values())


def test_tfidf_plan_is_jvm_only(spark):
    docs = spark.createDataFrame(
        [("a", "x y"), ("b", "y z")], "doc_id string, text string"
    )
    plan = textstats.tfidf_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan      # pure Catalyst, no Python stage


def test_bm25_semantics(spark):
    # 4 docs, query = {rare, common}. 'common' is everywhere -> idf
    # bits = flog2(4//4) = 0 -> contributes 0. 'rare' in 2 of 4 ->
    # flog2(2) = 1 bit. Higher tf wins at equal length; at equal tf a
    # LONGER doc scores lower (length normalization).
    docs = spark.createDataFrame(
        [
            ("a", "common rare rare pad"),              # tf=2, dl=4
            ("b", "common rare pad pad"),               # tf=1, dl=4
            ("c", "common pad pad pad"),                # no rare
            ("d", "common pad pad pad"),
        ],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in
           textstats.bm25_topk(docs, ["rare", "common"], k=10).collect()}
    assert out["a"].score_milli > out["b"].score_milli
    assert out["a"].rank == 1 and out["b"].rank == 2
    # docs c/d match only the idf-0 'common': present (drop-nothing
    # within the matched set) but score exactly 0, ranked by doc_id
    assert out["c"].score_milli == 0 and out["d"].score_milli == 0
    assert out["c"].rank == 3 and out["d"].rank == 4

    longer = spark.createDataFrame(
        [
            ("a", "rare pad"),                          # tf=1, dl=2
            ("b", "rare pad pad pad pad pad pad pad"),  # tf=1, dl=8
            ("c", "pad"), ("d", "pad"),
        ],
        "doc_id string, text string",
    )
    out2 = {r.doc_id: r for r in
            textstats.bm25_topk(longer, ["rare"], k=10).collect()}
    assert out2["a"].score_milli > out2["b"].score_milli
    assert "c" not in out2 and "d" not in out2   # no query term: no row


def test_bm25_plan_topk_heap_and_bounded_broadcasts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = textstats.bm25_topk(docs, ["hash", "join"], k=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # global top-k is a per-partition heap, never a full sort
    assert "TakeOrderedAndProject" in plan, plan
    # pure Catalyst end to end
    assert "EvalPython" not in plan, plan
    # the df and corpus-stat relations are the broadcast sides
    assert plan.count("BroadcastExchange") >= 2, plan


def test_bm25_casefolds_terms_and_rejects_empty(spark):
    import pytest

    docs = spark.createDataFrame(
        [("a", "retrieval pad pad"), ("b", "pad pad pad"),
         ("c", "pad"), ("d", "pad")],
        "doc_id string, text string",
    )
    # tokens() lowercases the corpus: a mixed-case query term must still
    # match (both twins case-fold via the shared _bm25_terms)
    out = {r.doc_id: r for r in
           textstats.bm25_topk(docs, ["Retrieval"], k=5).collect()}
    assert "a" in out and out["a"].score_milli > 0
    with pytest.raises(ValueError):
        textstats.bm25_topk(docs, [], k=5)
    with pytest.raises(ValueError):
        textstats.bm25_topk_sql([])
