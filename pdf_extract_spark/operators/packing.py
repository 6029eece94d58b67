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
from pyspark.sql.window import Window

from pdf_extract_spark.operators.hashing import phash, phash_sql
from pdf_extract_spark.operators.textstats import (
    _sql_quote,
    tokens,
    tokens_cased,
    tokens_cased_sql,
    tokens_sql,
)

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


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-token-window chunking with stride — the pretraining prep
    step for documents LONGER than the sequence budget (the complement
    of pack_documents, which packs documents shorter than it): split
    each document's token stream into windows of ``window`` tokens
    starting every ``stride`` tokens, so consecutive chunks overlap by
    ``window - stride`` tokens when stride < window.

    Chunks emit at starts 0, stride, 2*stride, ... while start < n, so
    the final chunk may be shorter than ``window`` and every token is
    covered; zero-token documents yield no chunks (nothing to train
    on). Output: (id, chunk_id, chunk_text, n_chunk_tokens) with
    chunk_id = start / stride (0-based, dense per doc).

    Chunking is whitespace-token based (textstats.tokens_cased — the
    portable tokenizer WITHOUT the statistics-only case folding: chunk
    output is corpus text and must preserve case), and chunk_text
    re-joins with single spaces: chunk boundaries are a modeling
    choice, not a byte-preserving transform (pack/chunk feed a
    tokenizer next, not a renderer).

    Scale (100 TB): map-only — tokenize, explode a bounded per-row
    start sequence, slice. ZERO shuffle, no Python; per-row
    amplification is ceil(n/stride), i.e. proportional to each
    document's own length, and a giant document's chunks are produced
    where the document already lives."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1 or stride > window:
        raise ValueError(
            f"stride must be in [1, window], got stride={stride} window={window}"
        )
    toks = tokens_cased(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    with_start = df.select(
        F.col(id_col), toks.alias("_toks"), F.explode(starts).alias("_start")
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, window)
    return with_start.select(
        id_col,
        (F.col("_start") / stride).cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


def chunk_documents_sql(
    window: int = 64,
    stride: int = 48,
    table: str = "documents",
    text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of chunk_documents (1-based inclusive list slicing;
    range() is empty for n = 0, dropping zero-token docs exactly like
    exploding an empty array; tokens_cased twin — no case folding)."""
    toks = tokens_cased_sql(text_expr)
    return f"""
WITH base AS (SELECT {id_col}, {toks} AS toks FROM {table}),
st AS (SELECT {id_col}, toks,
              unnest(range(0, len(toks), {stride})) AS start
       FROM base)
SELECT {id_col},
       (start // {stride})::BIGINT AS chunk_id,
       array_to_string(toks[start + 1:start + {window}], ' ') AS chunk_text,
       len(toks[start + 1:start + {window}])::BIGINT AS n_chunk_tokens
FROM st
"""


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 64,
    key_col: str = "doc_id",
    salt: str = "shuf",
    seed: int = 0,
) -> DataFrame:
    """Deterministic training-order shuffle — the "global shuffle"
    every pretraining run performs before sharding its examples feed,
    made reproducible: shard = portable-hash(salt:seed:key) mod
    ``n_shards``, within-shard rank by (hash, key), and a global
    position composed from exact cumulative shard sizes. The mapping
    key -> global_pos is a bijection onto [0, N): reading shards in
    shard order, each in pos_in_shard order, visits every row exactly
    once in an order uncorrelated with ingestion order. Hash-ordered,
    never random — the same seed reproduces the identical order across
    runs, partitionings and engines (checkpoint resume needs this; a
    new ``seed`` per epoch gives a fresh permutation).

    Returns (key_col, shard, pos_in_shard, global_pos), all ranks
    0-based longs. Keys must be unique and non-NULL to be ordered:
    NULL-key rows are dropped (a NULL hashes to NULL — no orderable
    position), and duplicate keys would tie on the full (hash, key)
    sort key, making their relative order undefined.

    Scale (100 TB): ONE data shuffle — the rank window partitioned by
    shard; n_shards is the parallelism knob (at petabyte scale use
    10^4-10^5 shards so each window partition is a sliver). The
    shard-size aggregate rides the window's own hashpartitioning
    exchange (ReusedExchange — co-partitioned, no second shuffle and
    no second scan), collapses to n_shards rows, takes its running
    total on a single bounded partition (the token_budget histogram
    discipline) and broadcasts back — document payloads never ride
    the offsets path.

    Reference analog: the deterministic processing-order guarantees of
    the reference's sequential pipeline (SURVEY §2 W8) lifted to a
    distributed permutation.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = phash(
        F.concat(F.lit(f"{salt}:{seed}:"), F.col(key_col).cast("string"))
    )
    # NULL keys are dropped: a NULL hashes to NULL, so such rows have
    # no orderable position (and several of them would tie completely,
    # making row_number nondeterministic). The filter is stated on the
    # shard expression itself so it lands below the exchange on BOTH
    # join inputs — the inner join would otherwise push its inferred
    # isnotnull only into the probe side, and the asymmetric subtrees
    # would defeat the exchange reuse this operator's plan pins.
    base = df.select(
        key_col,
        h.alias("_h"),
        F.pmod(h, F.lit(n_shards)).cast("long").alias("shard"),
    ).filter(F.col("shard").isNotNull())
    rw = Window.partitionBy("shard").orderBy("_h", key_col)
    ranked = base.withColumn(
        "pos_in_shard", (F.row_number().over(rw) - 1).cast("long")
    )
    # shard size = max(rank)+1, NOT count(*): a count would let the
    # optimizer column-prune the window off this path and re-plan the
    # aggregate with its own exchange — a second scan of the corpus.
    # Depending on the rank column pins the sizes path to the window's
    # hashpartitioning(shard) exchange, which the join's probe side
    # reuses (ReusedExchange, plan-pinned in test_shuffle_shards).
    sizes = ranked.groupBy("shard").agg(
        (F.max("pos_in_shard") + 1).alias("_n")
    )
    ow = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "shard", F.coalesce(F.sum("_n").over(ow), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offs), "shard")
        .select(
            key_col,
            "shard",
            "pos_in_shard",
            (F.col("_off") + F.col("pos_in_shard"))
            .cast("long")
            .alias("global_pos"),
        )
    )


def shuffle_shards_sql(
    n_shards: int = 64,
    table: str = "documents",
    key_col: str = "doc_id",
    salt: str = "shuf",
    seed: int = 0,
) -> str:
    """DuckDB mirror of shuffle_shards (same phash — positive, so
    % == pmod; the cumulative-offset window pins an explicit ROWS
    frame and ::BIGINT like every DuckDB window sum)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key_expr = _sql_quote(f"{salt}:{seed}:") + f" || {key_col}::VARCHAR"
    h = phash_sql(key_expr)
    return f"""
WITH shf AS (SELECT {key_col}, {h} AS h,
                    ({h} % {n_shards})::BIGINT AS shard
             FROM {table} WHERE {key_col} IS NOT NULL),
rnk AS (SELECT {key_col}, shard,
               (row_number() OVER (PARTITION BY shard ORDER BY h, {key_col})
                - 1)::BIGINT AS pos_in_shard
        FROM shf),
sz AS (SELECT shard, count(*) AS n FROM rnk GROUP BY shard),
offs AS (SELECT shard,
                coalesce(sum(n) OVER (ORDER BY shard
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0)::BIGINT AS off
         FROM sz)
SELECT r.{key_col}, r.shard, r.pos_in_shard,
       (o.off + r.pos_in_shard)::BIGINT AS global_pos
FROM rnk r JOIN offs o ON r.shard = o.shard
"""
