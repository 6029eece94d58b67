"""Semantic tests for the two r4 training-pipeline additions:
benchmark decontamination (n-gram collision vs an eval corpus) and PII
scrubbing (staged count-then-replace redaction). Cross-engine value
exactness is covered by the auto-iterating oracle gates (test_entry,
test_dtype_gate); these tests pin the operator semantics on constructed
corpora where the expected verdicts are hand-computable."""

from __future__ import annotations

from pdf_extract_spark.operators import dedup, textstats

SCHEMA = "doc_id long, text string"


def test_decontaminate_planted_overlap(spark):
    ev = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta")], SCHEMA
    )
    corpus = spark.createDataFrame(
        [
            # shares the 5-gram "alpha beta gamma delta epsilon"
            (1, "alpha beta gamma delta epsilon eta"),
            (2, "one two three four five six"),  # disjoint
            # < 5 tokens -> whole text is the single gram; not in eval
            (3, "alpha beta gamma delta"),
        ],
        SCHEMA,
    )
    out = {r["doc_id"]: r for r in dedup.decontaminate(corpus, ev).collect()}
    assert out[1]["is_contaminated"]
    assert out[1]["n_grams"] == 2 and out[1]["n_hits"] == 1
    assert out[1]["contam_frac"] == 0.5
    assert not out[2]["is_contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["is_contaminated"] and out[3]["n_grams"] == 1


def test_decontaminate_short_doc_exact_match(spark):
    """Sub-k documents degrade to whole-text comparison on BOTH sides,
    so an eval question shorter than k tokens is still protected."""
    ev = spark.createDataFrame([(7, "tiny question")], SCHEMA)
    corpus = spark.createDataFrame(
        [(1, "tiny question"), (2, "tiny answer")], SCHEMA
    )
    out = {r["doc_id"]: r for r in dedup.decontaminate(corpus, ev).collect()}
    assert out[1]["is_contaminated"]
    assert not out[2]["is_contaminated"]


def test_pii_scrub_stage_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            (0, "reach me at a.b@c.org or 123-45-6789 or +44 20 7946 0958"),
            (1, "no pii here"),
        ],
        SCHEMA,
    )
    out = {r["doc_id"]: r for r in textstats.pii_scrub(df).collect()}
    # the SSN-style id is consumed by the ID stage BEFORE the looser
    # phone pattern can see it — one of each, not two phones
    assert (out[0]["n_emails"], out[0]["n_ids"], out[0]["n_phones"]) == (1, 1, 1)
    assert out[0]["scrubbed"] == "reach me at [EMAIL] or [ID] or [PHONE]"
    assert (out[1]["n_emails"], out[1]["n_ids"], out[1]["n_phones"]) == (0, 0, 0)
    assert out[1]["scrubbed"] == "no pii here"


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op: placeholder tokens
    contain no digits or @, so they never re-match any stage."""
    df = spark.createDataFrame(
        [(0, "mail x@y.io and call 555 0199 2211 ref 123-45-6789")], SCHEMA
    )
    first = textstats.pii_scrub(df)
    again = textstats.pii_scrub(
        first.selectExpr("doc_id", "scrubbed AS text")
    ).first()
    assert (again["n_emails"], again["n_ids"], again["n_phones"]) == (0, 0, 0)
    assert again["scrubbed"] == first.first()["scrubbed"]


def test_decontaminate_fuzzy_grades_overlap(spark):
    """Fuzzy decontamination is the PRECISION-graded sibling of the
    exact any-collision rule: an incidental shared idiom fires the exact
    rule but stays under the Jaccard threshold, while a lightly edited
    near-copy of benchmark text fires both."""
    ev = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lamda mu nu xi omicron pi rho sigma tau upsilon")],
        SCHEMA,
    )
    corpus = spark.createDataFrame(
        [
            # near-copy: one appended token
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lamda mu nu xi omicron pi rho sigma tau upsilon phi"),
            # incidental idiom: shares one 5-token run, otherwise disjoint
            (2, "alpha beta gamma delta epsilon one two three four five "
                "six seven eight nine ten eleven twelve"),
            (3, "totally unrelated text about something else entirely"),
        ],
        SCHEMA,
    )
    exact = {r["doc_id"]: r["is_contaminated"]
             for r in dedup.decontaminate(corpus, ev).collect()}
    fuzzy = {r["doc_id"]: r
             for r in dedup.decontaminate_fuzzy(corpus, ev).collect()}
    assert exact[1] and exact[2] and not exact[3]
    assert fuzzy[1]["is_contaminated"] and fuzzy[1]["max_jaccard"] >= 0.5
    assert not fuzzy[2]["is_contaminated"]
    assert not fuzzy[3]["is_contaminated"]
    assert fuzzy[3]["n_eval_matches"] == 0 and fuzzy[3]["max_jaccard"] == 0.0
