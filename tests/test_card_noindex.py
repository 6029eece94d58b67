"""noindex_flags / corpus_card units (composed fixture paths are
oracle-gated in test_entry/test_dtype_gate; these pin the tag-boundary
contract and the integer card arithmetic on crafted rows)."""

from __future__ import annotations

from pdf_extract_spark.operators import html as H, textstats


def test_noindex_variants_and_decoy(spark):
    rows = [
        ("canon", '<meta name="robots" content="noindex, nofollow">'),
        ("rev", "<META CONTENT='NOINDEX' NAME='robots'>"),
        ("follow", '<meta name="robots" content="index, follow">'),
        ("none", "<title>x</title>"),
        # decoy: 'noindex' in a DIFFERENT meta tag — [^>]* cannot cross
        # the tag boundary, so this must not flag even with a robots
        # meta adjacent
        ("decoy", '<meta name="robots" content="all"><meta name="description" content="noindex talk">'),
    ]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    out = {r["doc_id"]: r["noindex"] for r in H.noindex_flags(df).collect()}
    assert out == {
        "canon": True, "rev": True, "follow": False,
        "none": False, "decoy": False,
    }


def test_corpus_card_integer_arithmetic(spark):
    df = spark.createDataFrame(
        [
            ("a", "one two three", "en"),
            ("b", "vier fünf", "de"),
            ("c", "sechs", "de"),
            ("d", None, None),
        ],
        "doc_id string, text string, lang string",
    )
    out = {r["stratum"]: r.asDict() for r in textstats.corpus_card(df).collect()}
    # totals: en 3 tokens, de 3, NULL 0 -> 6 corpus tokens
    assert out["en"]["n_docs"] == 1 and out["en"]["n_tokens"] == 3
    assert out["de"]["n_docs"] == 2 and out["de"]["n_tokens"] == 3
    assert out[None]["n_tokens"] == 0 and out[None]["n_chars"] == 0
    assert out["en"]["token_share_milli"] == 500   # 3*1000 DIV 6
    assert out["de"]["mean_tokens_milli"] == 1500  # 3*1000 DIV 2
    assert out[None]["token_share_milli"] == 0
