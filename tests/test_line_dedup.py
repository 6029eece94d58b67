"""dedup_lines — corpus-level duplicated-line removal (RefinedWeb/CCNet
step; the between-documents boilerplate the document-level dedup
families can't express). The registered `line_dedup` query is value- and
dtype-exact vs DuckDB in the entry/dtype gates; this file pins the
operator's edge semantics and plan shape directly."""

from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def _collect(df):
    return {
        r["doc_id"]: (r["clean_text"], r["n_removed"], r["n_kept"])
        for r in df.collect()
    }


def test_dedup_lines_edge_semantics(spark):
    rows = [
        # 'nav bar' occurs 3x (>= min_count) -> removed everywhere;
        # '  nav bar  ' counts via its TRIMMED key but survivors keep
        # their raw padding; 'pair' occurs exactly 2x -> kept (threshold
        # boundary); blank lines are structure -> kept, never counted.
        (0, "nav bar\nunique zero\n\npair"),
        (1, "  nav bar  \nunique one\npair"),
        (2, "nav bar\n\n\n"),          # all non-blank lines removed
        (3, ""),                        # empty doc -> single blank line
        (4, "nav bar"),                 # whole doc removed -> ''
        (5, None),                      # NULL text: doc must SURVIVE
    ]
    got = _collect(dedup.dedup_lines(_docs(spark, rows), min_count=3))
    assert got == {
        0: ("unique zero\n\npair", 1, 3),
        1: ("unique one\npair", 1, 2),
        2: ("\n\n", 1, 3),
        3: ("", 0, 1),
        4: ("", 1, 0),
        5: ("", 0, 1),
    }


def test_dedup_lines_padding_survives_below_threshold(spark):
    # the padded spelling alone is below min_count: kept with padding
    rows = [(0, "  spaced  \nbody a"), (1, "body b")]
    got = _collect(dedup.dedup_lines(_docs(spark, rows), min_count=2))
    assert got[0] == ("  spaced  \nbody a", 0, 2)
    assert got[1] == ("body b", 0, 1)


def test_dedup_lines_plan_is_pure_catalyst(spark):
    df = dedup.dedup_lines(
        _docs(spark, [(i, f"nav\nbody {i}") for i in range(20)]), min_count=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no Python anywhere; the frequency pass + the line/bad join + the
    # doc_id reassembly are the only exchanges (AQE may broadcast the
    # single-column heavy-hitter side, dropping one)
    assert "EvalPython" not in plan
    n_ex = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_ex <= 3, plan


def test_dedup_lines_matches_python_model_on_adversarial_corpus(spark):
    """Seeded 200-doc corpus drawn from a collision-forcing pool with
    tabs, NBSP, carriage returns and space padding; compared against an
    independent pure-Python model of the contract (split keeps trailing
    empties; the count/removal key strips SPACES only, like Spark trim;
    blank keys never count)."""
    import random
    from collections import Counter

    rng = random.Random(7)
    pool = [
        "share on facebook", "cookie notice", "\tshare on facebook",
        "nav\rbar", "a b", "  cookie notice  ", "cookie notice\t",
    ]
    rows = []
    for d in range(200):
        n = rng.randint(0, 6)
        ls = [
            rng.choice(pool) if rng.random() < 0.4
            else rng.choice(["", f"body {d} {i}", f"  body {d} {i}  "])
            for i in range(n)
        ]
        rows.append((d, "\n".join(ls)))

    def model(rows, min_count):
        split = {d: t.split("\n") for d, t in rows}
        cnt = Counter(
            l.strip(" ") for ls in split.values() for l in ls if l.strip(" ")
        )
        bad = {k for k, c in cnt.items() if c >= min_count}
        return {
            d: (
                "\n".join(l for l in ls if l.strip(" ") not in bad),
                sum(l.strip(" ") in bad for l in ls),
                sum(l.strip(" ") not in bad for l in ls),
            )
            for d, ls in split.items()
        }

    for k in (2, 5):
        got = _collect(dedup.dedup_lines(_docs(spark, rows), min_count=k))
        assert got == model(rows, k), f"min_count={k}"


def _ddocs(spark, rows):
    return spark.createDataFrame(
        rows, schema="doc_id long, domain string, text string"
    )


def _dcollect(df):
    return {
        r["doc_id"]: (r["domain"], r["clean_text"], r["n_removed"], r["n_kept"])
        for r in df.collect()
    }


def test_dedup_lines_by_domain_scopes_counts_per_site(spark):
    rows = [
        # 'chrome' reaches min_docs=3 only on site a: removed there,
        # KEPT on site b (2 docs) even though globally it occurs 5x —
        # the discriminating difference vs corpus-global dedup_lines.
        (0, "a", "chrome\nbody zero"),
        (1, "a", "chrome\nbody one"),
        (2, "a", "chrome\nbody two"),
        (3, "b", "chrome\nbody three"),
        (4, "b", "chrome\nbody four"),
    ]
    got = _dcollect(
        dedup.dedup_lines_by_domain(_ddocs(spark, rows), min_docs=3)
    )
    assert got[0] == ("a", "body zero", 1, 1)
    assert got[2] == ("a", "body two", 1, 1)
    assert got[3] == ("b", "chrome\nbody three", 0, 2)
    assert got[4] == ("b", "chrome\nbody four", 0, 2)


def test_dedup_lines_by_domain_counts_distinct_docs_not_occurrences(spark):
    # the same line pasted twice inside ONE page counts once: 2 distinct
    # docs < min_docs=3 -> kept everywhere, despite 3 raw occurrences
    rows = [
        (0, "a", "promo\npromo\nbody zero"),
        (1, "a", "promo\nbody one"),
        (2, "a", "body two"),
    ]
    got = _dcollect(
        dedup.dedup_lines_by_domain(_ddocs(spark, rows), min_docs=3)
    )
    assert got[0] == ("a", "promo\npromo\nbody zero", 0, 3)
    assert got[1] == ("a", "promo\nbody one", 0, 2)
    # at min_docs=2 the 2-doc frequency crosses the bar: removed, and
    # BOTH copies inside doc 0 go
    got2 = _dcollect(
        dedup.dedup_lines_by_domain(_ddocs(spark, rows), min_docs=2)
    )
    assert got2[0] == ("a", "body zero", 2, 1)
    assert got2[1] == ("a", "body one", 1, 1)


def test_dedup_lines_by_domain_null_domain_passes_through(spark):
    # NULL-domain rows are unkeyed: never counted against each other,
    # never removed (equality join can't match NULL)
    rows = [
        (0, None, "chrome\nbody zero"),
        (1, None, "chrome\nbody one"),
        (2, None, "chrome\nbody two"),
        (3, "a", None),  # NULL text: doc survives as ''
    ]
    got = _dcollect(
        dedup.dedup_lines_by_domain(_ddocs(spark, rows), min_docs=3)
    )
    assert got[0] == (None, "chrome\nbody zero", 0, 2)
    assert got[2] == (None, "chrome\nbody two", 0, 2)
    assert got[3] == ("a", "", 0, 1)


def test_dedup_lines_by_domain_plan_is_pure_catalyst(spark):
    df = dedup.dedup_lines_by_domain(
        _ddocs(spark, [(i, f"s{i % 2}", f"nav\nbody {i}") for i in range(20)]),
        min_docs=3,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # distinct-doc count (partial distinct + final), offender join, doc
    # reassembly — bounded exchange count, no window anywhere
    n_ex = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_ex <= 4, plan
    assert "Window" not in plan


def test_minhash_accuracy_exact_on_identical_and_unbiased(spark):
    """Identical texts must read est=1000/exact=1000/err=0; a partial
    overlap's estimate stays a multiple of 1000//16 and the exact value
    matches the hand-computed shingle Jaccard."""
    from pdf_extract_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon nine ten eleven twelve"),
            (4, "completely different words in this one here"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): r
            for r in dedup.minhash_accuracy(df).collect()}
    assert (1, 2) in rows
    r12 = rows[(1, 2)]
    assert r12.est_milli == 1000 and r12.exact_milli == 1000
    assert r12.err_milli == 0
    for r in rows.values():
        # 16 components -> estimates quantized to floor(m*1000/16)
        assert r.est_milli in {m * 1000 // 16 for m in range(17)}
        assert r.err_milli == abs(r.est_milli - r.exact_milli)
