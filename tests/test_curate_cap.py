"""curate_corpus_capped's planted fixture must EXERCISE the cap
(VERDICT r4 item 3): the boilerplate family — every 7th corpus doc
carrying the same nav-bar/cookie-banner text — collapses to ONE keeper
without the degenerate-bucket guard, and stays SEPARATE keepers with it
(the cap is a recall cap: hot band buckets are excluded from candidate
generation, so family members never pair). The oracle twin
(tests/test_entry.py / test_dtype_gate.py) proves the capped pipeline's
values; this file proves the fixture is actually hot and the cap is the
thing producing the difference."""

import pyspark.sql.functions as F

from pdf_extract_spark import queries as Q
from pdf_extract_spark.operators import dedup as D
from tests.conftest import SF_DIR


def _decorated_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 7 == 3) & (F.col("doc_id") % 50 != 0),
            F.lit(Q._CURATE_BOILER),
        ).otherwise(F.col("text")),
    )
    return docs.filter(F.col("doc_id") % 50 != 0)


def _family_keepers(corpus, fam, max_bucket):
    pairs = D.minhash_lsh_pairs(corpus, max_bucket=max_bucket).select(
        "id_a", "id_b"
    )
    comps = D.dedup_components(pairs, universe=corpus)
    return (
        comps.filter(F.col("is_keeper"))
        .join(fam.select("doc_id"), "doc_id", "semi")
        .count()
    )


def test_capped_fixture_is_hot_and_cap_changes_keepers(spark):
    corpus = _decorated_corpus(spark)
    fam = corpus.filter(F.col("doc_id") % 7 == 3)
    n_fam = fam.count()
    # the fixture is genuinely hot: family size exceeds the cap, and the
    # audit surface (lsh_band_stats, the dropped-bucket ledger a capped
    # run consults) sees buckets above it
    assert n_fam > Q._CURATE_CAPPED_MAX_BUCKET
    hot_buckets = (
        D.lsh_band_stats(corpus)
        .filter(F.col("n_docs") > Q._CURATE_CAPPED_MAX_BUCKET)
        .count()
    )
    assert hot_buckets > 0
    # uncapped: identical text -> all-pairs -> one component -> 1 keeper
    assert _family_keepers(corpus, fam, None) == 1
    # capped: every family bucket is hot and excluded -> no family pairs
    # -> each member is its own keeper (recall cap, observable semantics)
    assert _family_keepers(
        corpus, fam, Q._CURATE_CAPPED_MAX_BUCKET
    ) == n_fam


def test_curate_full_stages_do_real_work(spark):
    """The curate_corpus_full fixture must EXERCISE its two new stages:
    line dedup removes the corpus-wide boilerplate line from every even
    doc, and pii_scrub replaces the planted contact line's email/phone
    with redaction tokens BEFORE anything downstream hashes the text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pdf_extract_spark import queries as Q
    from pdf_extract_spark.operators import textstats

    deco = Q._full_decorated(docs).filter(F.col("doc_id") % 50 != 0)
    ld = D.dedup_lines(deco)
    removed = ld.filter(F.col("n_removed") > 0).count()
    assert removed > 0
    sample = ld.filter((F.col("doc_id") % 2 == 0)).limit(5).collect()
    assert all("All Rights Reserved" not in r["clean_text"] for r in sample)
    scrub = textstats.pii_scrub(
        ld.select("doc_id", F.col("clean_text").alias("text"))
    )
    pii_rows = scrub.filter(F.col("n_emails") > 0)
    assert pii_rows.count() > 0
    one = pii_rows.limit(1).collect()[0]
    assert "[EMAIL]" in one["scrubbed"] and "@example.com" not in one["scrubbed"]
    assert "[PHONE]" in one["scrubbed"]
