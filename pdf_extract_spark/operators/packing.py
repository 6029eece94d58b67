"""Sequence packing — the training-batch assembly step of an LLM data
pipeline: documents are greedily packed, in deterministic doc_id order
within a hash bucket, into packs whose token totals stay within a
budget (oversized docs get a pack of their own).

Spark shape: one shuffle (groupBy bucket) + a per-bucket Arrow kernel;
buckets bound both the packing state and the recursion depth of the
DuckDB oracle (a recursive CTE stepping one row at a time per bucket).
At 10^12 documents the bucket count simply scales up — packing is
embarrassingly parallel across buckets, and determinism (hash bucket +
doc_id order) means a re-run assembles identical packs, which checkpoint
resume requires.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from pdf_extract_spark.operators.hashing import phash, phash_sql
from pdf_extract_spark.operators.textstats import tokens, tokens_sql

PACKED = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("pack_id", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
    ]
)


def pack_documents(
    df: DataFrame, budget: int = 128, n_buckets: int = 8,
    text_col: str = "text", key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, pack_id, n_tokens): greedy first-fit packing in
    doc_id order within each hash bucket — a new pack starts when adding
    the next doc would exceed ``budget`` (a single doc over budget packs
    alone). pack_id is bucket-local and 0-based."""
    key = F.col(key_col)
    base = df.select(
        key.cast("long").alias("doc_id"),
        F.pmod(phash(key.cast("string")), F.lit(n_buckets)).cast("int").alias("bucket"),
        # NULL text counts 0 tokens (size(split(NULL)) is NULL -> NaN in
        # the pandas kernel, which would poison the greedy cum forever)
        F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0))
        .cast("long").alias("n_tokens"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable sort on the FULL key: duplicate doc_ids (a re-ingested
        # doc) must walk in the same order as the oracle's
        # ORDER BY doc_id, n_tokens or pack assignment diverges
        pdf = pdf.sort_values(["doc_id", "n_tokens"], kind="mergesort")
        packs, cum, pack = [], 0, -1
        for tok in pdf["n_tokens"]:
            if pack < 0 or cum + tok > budget:
                pack += 1
                cum = 0
            cum += tok
            packs.append(pack)
        pdf = pdf.assign(pack_id=pd.Series(packs, index=pdf.index, dtype="int64"))
        return pdf[["doc_id", "bucket", "pack_id", "n_tokens"]]

    # groupBy().applyInPandas requires a hash distribution on bucket and
    # plans exactly one Exchange for it — no explicit repartition needed
    return base.groupBy("bucket").applyInPandas(
        lambda _key, pdf: kernel(pdf), schema=PACKED
    )



def pack_documents_ctes(
    budget: int = 128, n_buckets: int = 8, table: str = "documents",
    text_expr: str = "text", key_col: str = "doc_id",
) -> str:
    """The packing walk (base/numbered/walk) as a composable CTE body —
    curate_corpus_sql splices it after its own CTEs; ``walk`` ends up
    holding (bucket, rn, doc_id, n_tokens, cum, pack_id)."""
    h = phash_sql(f"{key_col}::VARCHAR")
    return f"""base AS (
  SELECT {key_col}::BIGINT AS doc_id,
         ({h} % {n_buckets})::INT AS bucket,
         coalesce(len({tokens_sql(text_expr)}), 0)::BIGINT AS n_tokens
  FROM {table}),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id, n_tokens) AS rn
  FROM base),
walk(bucket, rn, doc_id, n_tokens, cum, pack_id) AS (
    SELECT bucket, rn, doc_id, n_tokens, n_tokens, 0::BIGINT
    FROM numbered WHERE rn = 1
  UNION ALL
    SELECT n.bucket, n.rn, n.doc_id, n.n_tokens,
           CASE WHEN w.cum + n.n_tokens > {budget} THEN n.n_tokens
                ELSE w.cum + n.n_tokens END,
           CASE WHEN w.cum + n.n_tokens > {budget} THEN w.pack_id + 1
                ELSE w.pack_id END
    FROM walk w JOIN numbered n ON n.bucket = w.bucket AND n.rn = w.rn + 1)"""


def pack_documents_sql(
    budget: int = 128, n_buckets: int = 8, table: str = "documents",
    text_expr: str = "text", key_col: str = "doc_id",
) -> str:
    """DuckDB mirror: recursive CTE walking each bucket's rows in doc_id
    order, carrying (cum, pack) — the exact greedy recurrence."""
    ctes = pack_documents_ctes(budget, n_buckets, table, text_expr, key_col)
    return f"""
WITH RECURSIVE {ctes}
SELECT doc_id, bucket, pack_id, n_tokens FROM walk
"""
