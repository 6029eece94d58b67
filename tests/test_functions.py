"""Column-function tests (C8 quote normalization, C11 NFKC)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from pdf_extract_spark import functions as X
from pdf_extract_spark.rules import nfkc as nfkc_scalar, normalize_quotes


def test_quote_norm_matches_rule(spark):
    rows = [("“quoted” and ‘single’ and `tick`",), ("„low‟ plain",), (None,)]
    df = spark.createDataFrame(rows, ["t"])
    got = [r["o"] for r in df.select(X.quote_norm(F.col("t")).alias("o")).collect()]
    exp = [normalize_quotes(t) if t is not None else None for (t,) in rows]
    assert got == exp


def test_nfkc_matches_stdlib(spark):
    rows = [("ﬁle ½ ㎡ Ａ",), ("x²y",), (None,), ("plain",)]
    df = spark.createDataFrame(rows, ["t"])
    got = [r["o"] for r in df.select(X.nfkc(F.col("t")).alias("o")).collect()]
    exp = [
        unicodedata.normalize("NFKC", t) if t is not None else None for (t,) in rows
    ]
    assert got == exp
    assert got[0] == nfkc_scalar("ﬁle ½ ㎡ Ａ")  # same rule the oracle uses


def test_remove_numbering_col_matches_rules_on_whitespace(spark):
    """The Catalyst twin must agree with rules.remove_numbering on
    non-space leading whitespace (Python lstrip() strips all ws; SQL
    ltrim would strip spaces only — the twin uses a regex lstrip)."""
    from pdf_extract_spark import rules
    from pdf_extract_spark.functions import remove_numbering_col

    cases = ["\tIntroduction", "\t 1.2 Title", "  3. indented", "\n7) x", "plain"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {r["t"]: r["out"] for r in df.select(
        "t", remove_numbering_col(df["t"]).alias("out")).collect()}
    for c in cases:
        assert got[c] == rules.remove_numbering(c), repr(c)


def test_remove_numbering_unicode_ws_tri_parity(spark):
    """The rule-core numbering patterns are PYTHON regexes (Unicode \\s);
    the column and DuckDB twins port them to the explicit _PY_WS class —
    all three must strip the same prefixes on NBSP/U+3000-indented
    text (Java/RE2 \\s is ASCII-only and would skip them)."""
    import duckdb

    from pdf_extract_spark import rules
    from pdf_extract_spark.queries import _remove_numbering_sql_expr

    cases = [
        "1. Heading",
        "　1. ideographic-space indent",
        " (2) nbsp indent",
        "IV.\ttab",
        "no prefix here",
    ]
    want = [rules.remove_numbering(c) for c in cases]
    sdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, t string"
    )
    got = [
        r["o"]
        for r in sdf.select(
            "i", X.remove_numbering_col(F.col("t")).alias("o")
        ).orderBy("i").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    sql = [
        r[0]
        for r in con.execute(
            f"SELECT {_remove_numbering_sql_expr('t', 'text')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == want == sql
