"""harvest_anchors / anchor_terms units (the composed fixture path is
oracle-gated in test_entry/test_dtype_gate; this pins the pairing,
the plain-text-anchor miss contract, and the host fold)."""

from __future__ import annotations

from pdf_extract_spark.operators import html as H, weburl


PAGE = (
    '<p><a class="x" href="HTTP://WWW.One.com/a?utm_source=z">read the report</a>'
    " <a rel='n' href='https://one.com/b'>read more</a>"
    ' <a href="mailto:x@y.test">contact us</a>'
    ' <a href="https://two.org/c"><b>bold</b></a></p>'
)


def test_harvest_anchors_pairs_and_misses(spark):
    df = spark.createDataFrame([("d1", PAGE)], "doc_id string, html string")
    rows = {(r["url"], r["anchor"]) for r in H.harvest_anchors(df).collect()}
    assert ("HTTP://WWW.One.com/a?utm_source=z", "read the report") in rows
    assert ("https://one.com/b", "read more") in rows
    assert ("mailto:x@y.test", "contact us") in rows
    # nested-tag anchor is skipped by contract (plain-text anchors only)
    assert not any(u == "https://two.org/c" for u, _ in rows)
    assert len(rows) == 3


def test_anchor_terms_folds_hosts_and_ranks(spark):
    df = spark.createDataFrame([("d1", PAGE)], "doc_id string, html string")
    out = weburl.anchor_terms(H.harvest_anchors(df), top=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # mailto dropped (canonicalizes to NULL): only one.com remains, and
    # BOTH quote-style anchors folded into it (scheme/host case + www.)
    assert set(by_host) == {"one.com"}
    ranked = sorted(by_host["one.com"], key=lambda r: r["rnk"])
    # 'read' appears in both anchors (n=2, rank 1); ties at n=1 cut by
    # term ASC -> 'more' takes rank 2
    assert (ranked[0]["term"], ranked[0]["n"]) == ("read", 2)
    assert (ranked[1]["term"], ranked[1]["n"]) == ("more", 1)
    assert all(r["rnk"] <= 2 for r in out)
