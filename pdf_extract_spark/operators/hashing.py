"""Engine-portable deterministic hashing.

The correctness gate compares Spark results against DuckDB running ANSI
SQL on the same parquet — so any hash used in a checked query must be
computable, bit-identically, in both engines. ``xxhash64``/``hash`` differ
between engines; **md5 does not**. We derive a 60-bit integer from the
first 15 hex chars of md5:

  Spark :  conv(substring(md5(s), 1, 15), 16, 10)::bigint
  DuckDB:  ('0x' || substr(md5(s), 1, 15))::bigint

Both are positive (< 2^60), so modular arithmetic below never overflows
int64 when combined with small multipliers.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime) for rolling hashes


def phash(col: Column) -> Column:
    """Portable 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def phash_sql(expr: str) -> str:
    """Portable hash of a string expression (DuckDB side)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"



