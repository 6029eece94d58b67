"""End-to-end tests for the production curation entry point
(pdf_extract_spark/curation.py) — the operational twin of the oracle
fixtures curate_corpus / curate_corpus_full: explicit eval table,
whole-input curation, optional sampling."""

import pyspark.sql.functions as F
import pytest

from pdf_extract_spark.curation import curate_documents

BOILER = "All Rights Reserved"


def _doc(i, body, lang="en"):
    # every doc carries the corpus-wide boilerplate line (>=3 occurrences
    # -> removed by line dedup) around a unique body
    return (i, f"{BOILER}\n{body}", lang, "web")


def _body(tag):
    # 24 words, stopword-rich (passes min_tokens=20 / stopword gate)
    return (
        f"the {tag} report is a long account of the {tag} season and "
        f"it goes on to describe the {tag} results in detail for everyone"
    )


@pytest.fixture(scope="module")
def curated(spark):
    docs = spark.createDataFrame(
        [
            # near-dup family: 1/2/3 share one body -> keeper = 1
            _doc(1, _body("harvest")),
            _doc(2, _body("harvest")),
            _doc(3, _body("harvest")),
            # unique survivors
            _doc(4, _body("voyage")),
            # PII doc: email + phone redacted before signatures
            _doc(5, _body("ledger") + " contact alice@example.com office 555-123-4567"),
            # low quality: too few tokens after cleaning
            (6, BOILER + "\ntiny text", "en", "web"),
            # contaminated: shares the planted 5-gram with the eval doc
            _doc(7, _body("census") + " quartz marble basalt granite slate"),
        ],
        schema="doc_id long, text string, lang string, source string",
    )
    ev = spark.createDataFrame(
        [(1000, "quartz marble basalt granite slate obsidian")],
        schema="doc_id long, text string",
    )
    # min_count=4: the corpus-wide boilerplate (7 occurrences) is still
    # removed, but the near-dup family's shared BODY line (3 occurrences
    # across docs 1/2/3) must survive line dedup so the family reaches
    # the MinHash stage intact — at the default 3 the line pass would
    # wipe the family's text before near-dedup ever saw it
    out = curate_documents(
        docs, eval_docs=ev, min_tokens=20, line_dedup_min_count=4
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_curate_documents_survivor_set(curated):
    # 2/3 collapse into 1; 6 fails quality; 7 decontaminated away
    assert set(curated) == {1, 4, 5}


def test_curate_documents_cleans_text(curated):
    for r in curated.values():
        assert BOILER not in r["text"]  # corpus-wide line removed
    assert "[EMAIL]" in curated[5]["text"]
    assert "[PHONE]" in curated[5]["text"]
    assert "alice@example.com" not in curated[5]["text"]


def test_curate_documents_packs(curated):
    for r in curated.values():
        assert r["pack_id"] >= 0 and r["bucket"] >= 0 and r["n_tokens"] > 0
        assert r["lang"] == "en" and r["source"] == "web"


def test_curate_documents_sampling(spark):
    docs = spark.createDataFrame(
        [_doc(i, _body(f"tag{i}"), lang=("en" if i % 2 else "de"))
         for i in range(1, 21)],
        schema="doc_id long, text string, lang string, source string",
    )
    out = curate_documents(
        docs, sample_rates={"en": 0.0}, min_tokens=20
    ).collect()
    langs = {r["lang"] for r in out}
    # en sampled away entirely; de (unlisted) keeps everything
    assert langs == {"de"}
    assert len(out) == 10


def test_cli_sample_rate_parsing():
    """--sample is validated at argparse time (before any SparkSession):
    trailing commas are tolerated, malformed entries fail with a legible
    ArgumentTypeError."""
    import argparse

    import cli

    assert cli._parse_rates("en=0.3,de=1.0,") == {"en": 0.3, "de": 1.0}
    assert cli._parse_rates(" en = 0.3 ".replace(" ", "")) == {"en": 0.3}
    assert cli._parse_rates(",") is None
    with pytest.raises(argparse.ArgumentTypeError, match="must be lang=rate"):
        cli._parse_rates("en")
    with pytest.raises(argparse.ArgumentTypeError, match="not a number"):
        cli._parse_rates("en=lots")


def test_corpus_diff_statuses_and_null_text(spark):
    """added/removed/changed/unchanged classification; a present doc
    with NULL text is NOT 'added' (presence flags, not fingerprint
    NULLness), and two NULL-text versions are 'unchanged' (null-safe
    fingerprint compare)."""
    from pdf_extract_spark import curation

    old = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "delta"), (3, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma CHANGED"), (3, None), (4, "fresh")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curation.corpus_diff(old, new).collect()}
    assert rows[0]["status"] == "unchanged"
    assert rows[1]["status"] == "changed"
    assert rows[2]["status"] == "removed"
    assert rows[3]["status"] == "unchanged"  # NULL == NULL null-safely
    assert rows[3]["old_fingerprint"] is None
    assert rows[4]["status"] == "added"
    assert rows[4]["old_fingerprint"] is None
    assert rows[2]["new_fingerprint"] is None


def test_corpus_diff_join_carries_only_fingerprints(spark):
    """Scale pin: the full outer join's inputs project (key,
    fingerprint, flag) — the text column must not appear above the
    fingerprint projection in the join subtree."""
    from pyspark.sql import functions as F

    from pdf_extract_spark import curation

    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        curation.corpus_diff(df, df)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # A logical "Join FullOuter" line prints only type+condition, so
    # asserting on it is vacuous. The real pin: the Projects COMPUTING
    # the fingerprints must sit BELOW the join line (a naive variant
    # that joins text payloads first computes them above it).
    lines = plan.splitlines()
    j = next(i for i, line in enumerate(lines) if "Join FullOuter" in line)
    old_def = next(
        i for i, line in enumerate(lines) if "AS old_fingerprint" in line
    )
    new_def = next(
        i for i, line in enumerate(lines) if "AS new_fingerprint" in line
    )
    assert old_def > j and new_def > j, plan
    phys = (
        curation.corpus_diff(df, df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in phys and "CartesianProduct" not in phys


def test_corpus_diff_null_text_twin_faithful(spark):
    """The fingerprint SQL twin must be NULL-faithful: old=NULL text vs
    new='' text is 'changed' in BOTH engines (NULL fp vs fp 0) — before
    the guard DuckDB fabricated fp 0 for NULL text and called it
    'unchanged'."""
    import duckdb

    from pdf_extract_spark import curation

    old = spark.createDataFrame([(0, None)], "doc_id long, text string")
    new = spark.createDataFrame([(0, "")], "doc_id long, text string")
    srow = curation.corpus_diff(old, new).collect()[0]
    assert srow["status"] == "changed"
    assert srow["old_fingerprint"] is None and srow["new_fingerprint"] == 0
    con = duckdb.connect()
    # view names must not collide with corpus_diff_sql's internal o/n CTEs
    con.execute("CREATE VIEW oldt AS SELECT 0::BIGINT AS doc_id, NULL::VARCHAR AS text")
    con.execute("CREATE VIEW newt AS SELECT 0::BIGINT AS doc_id, '' AS text")
    orow = con.sql(curation.corpus_diff_sql("oldt", "newt")).fetchone()
    assert orow == (0, "changed", None, 0)
