"""Column-level text functions (SURVEY.md §2.7 C8/C11) exposed as
first-class building blocks.

* ``quote_norm`` — curly-quote normalization (metadata_generator.py:76-83)
  stays a pure Catalyst ``translate`` (JVM-side, codegen'd);
* ``nfkc`` — NFKC normalization (metadata_generator.py:359,542-543) has no
  Spark builtin, so it is the one sanctioned Python hop: an Arrow-batched
  pandas UDF over ``str`` vectorization.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

_CURLY = "“”„‟‘’`"
_PLAIN = '""""' + "''" + "'"


def quote_norm(col: Column) -> Column:
    """C8 — curly doubles -> '\"', curly singles/backtick -> \"'\"."""
    return F.translate(col, _CURLY, _PLAIN)


@pandas_udf(T.StringType())
def nfkc(s: pd.Series) -> pd.Series:
    """C11 — NFKC normalization, vectorized over the Arrow batch."""
    return s.map(lambda t: unicodedata.normalize("NFKC", t) if t is not None else None)


def port_python_ws(pattern: str) -> str:
    r"""Translate a RULE-CORE Python regex to the portable Java+RE2 form:
    Python's \s is Unicode while Java/RE2's is ASCII-only, so bare \s
    becomes the explicit _PY_WS class. ONE definition for the Catalyst
    column twin AND the DuckDB oracle (queries.py) — valid only while
    the numbering patterns use \s bare (never inside a class, never
    \S), which rules.py's pattern lists do."""
    from pdf_extract_spark.operators.metacompare import _PY_WS

    return pattern.replace("\\s", _PY_WS)


def remove_numbering_col(col: Column, context: str = "text") -> Column:
    """C7 as pure Catalyst — the ``when(rlike).regexp_replace`` chain form
    of rules.remove_numbering (metadata_generator.py:44-74): ordered
    patterns, FIRST match only (the when-chain short-circuits exactly like
    the reference's ``break``), matched prefix replaced by a space, then
    ltrim. Every pattern is ^-anchored, so regexp_replace rewrites at most
    one site and equals the reference's ``sub(count=1)``."""
    from pdf_extract_spark import rules
    from pdf_extract_spark.operators.metacompare import _PY_WS

    patterns = [
        f"(?i){port_python_ws(p.pattern)}" for p in rules.COMMON_NUMBERING_PATTERNS
    ]
    if context == "text":
        patterns += [
            port_python_ws(p.pattern) for p in rules.TEXT_ONLY_NUMBERING_PATTERNS
        ]
    out = None
    for pat in patterns:
        branch = F.regexp_replace(col, pat, " ")
        out = F.when(col.rlike(pat), branch) if out is None else out.when(col.rlike(pat), branch)
    # Python str.lstrip() strips ALL whitespace (incl. NBSP/U+3000);
    # Spark/DuckDB ltrim strips only 0x20 and Java/RE2 \s are ASCII-only
    # AND disagree on \x0B — the explicit _PY_WS class is the one
    # spelling equal to the Python rule in BOTH engines
    return F.regexp_replace(out.otherwise(col), f"^{_PY_WS}+", "")
