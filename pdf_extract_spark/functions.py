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
