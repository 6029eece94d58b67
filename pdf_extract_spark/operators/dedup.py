"""Deduplication operators for training-data pipelines.

Six families, all engine-portable (verified against DuckDB oracles):

  * exact            — md5 of normalized text, keep-first (A7 semantics)
  * n-gram Jaccard   — word-shingle set similarity, exact pair join
  * MinHash + LSH    — banded minhash candidate generation + Jaccard verify
  * SimHash          — 32-bit sign-of-weighted-bits near-dup hash
  * embedding cosine — see similarity.py (near_dup_pairs)
  * component resolution — near-dup pairs -> duplicate CLUSTERS via
    min-label propagation (dedup_components)

Scale notes (100 TB):
  * exact dedup is one hash-aggregate (partial combine map-side);
  * the exact-Jaccard pair join is quadratic per shingle bucket — it is
    the *verifier*; at scale candidates come from MinHash-LSH bands, whose
    shuffle is bounded by band-bucket size (we cap candidate pairs per
    bucket by construction: band keys include the band id);
  * all hashing is md5-derived (portable) and JVM-side — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from pdf_extract_spark.operators.hashing import phash, phash_sql
from pdf_extract_spark.operators.textstats import (
    WS,
    tokens,
    tokens_cased,
    tokens_cased_sql,
    tokens_sql,
)

# -------------------------------------------------------------- normalize

def norm_text(col):
    # textstats.WS, not \s: Java and RE2 disagree on \x0B (see tokens)
    return F.lower(F.trim(F.regexp_replace(col, WS + "+", " ")))


NORM_SQL = "lower(trim(regexp_replace({e}, '" + WS + "+', ' ', 'g')))"


# ------------------------------------------------------------ exact dedup

def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep-first exact dedup over normalized text: one row per distinct
    normalized text, keeper = min doc_id (deterministic keep-'first').
    Returns (text_hash, keeper_id, n_dups)."""
    return (
        df.select(
            phash(norm_text(F.col(text_col))).alias("text_hash"),
            F.col("doc_id"),
        )
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup_sql(table: str = "documents", text_expr: str = "text") -> str:
    h = phash_sql(NORM_SQL.format(e=text_expr))
    return f"""
SELECT {h} AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_dups
FROM {table} GROUP BY 1
"""


def exact_dedup_keepbest(
    df: DataFrame, score_col: str = "n_chars", text_col: str = "text"
) -> DataFrame:
    """Quality-aware exact dedup (the CCNet-style "keep the best copy"
    policy): one row per distinct normalized text, keeper = the
    duplicate with the HIGHEST ``score_col`` (ties break to the smallest
    doc_id), for corpora where re-crawls of the same page differ in
    metadata completeness or upstream quality scores.

    Same one-aggregate scale shape as ``exact_dedup``: the argmax is a
    lexicographic MIN over (negated score, doc_id) structs — associative
    and partial-combinable, so the map-side combine collapses each
    mapper's duplicates before the only shuffle. A window-free argmax:
    a row_number window here would funnel every duplicate family through
    one task per text_hash.

    Returns (text_hash, keeper_id, best_score, n_dups)."""
    keyed = df.select(
        phash(norm_text(F.col(text_col))).alias("text_hash"),
        "doc_id",
        F.col(score_col).cast("long").alias("_score"),
    )
    m = F.min(
        F.struct((-F.col("_score")).alias("ns"), F.col("doc_id").alias("id"))
    )
    return (
        keyed.groupBy("text_hash")
        .agg(m.alias("_m"), F.count("*").alias("n_dups"))
        .select(
            "text_hash",
            F.col("_m.id").alias("keeper_id"),
            (-F.col("_m.ns")).cast("long").alias("best_score"),
            "n_dups",
        )
    )


def exact_dedup_keepbest_sql(
    table: str = "documents",
    text_expr: str = "text",
    score_expr: str = "n_chars",
) -> str:
    """DuckDB mirror of ``exact_dedup_keepbest`` (named-struct min is
    lexicographic by field order in both engines)."""
    h = phash_sql(NORM_SQL.format(e=text_expr))
    return f"""
WITH g AS (
  SELECT {h} AS text_hash,
         min({{'ns': -({score_expr})::BIGINT, 'id': doc_id}}) AS m,
         count(*) AS n_dups
  FROM {table} GROUP BY 1)
SELECT text_hash, m.id AS keeper_id, (-m.ns)::BIGINT AS best_score, n_dups
FROM g
"""


# --------------------------------------------------------------- shingles

def shingles(col, k: int = 3):
    """Distinct word k-shingles of a text column (JVM higher-order fns).

    Built by zip_with-ing k shifted slices rather than
    transform(sequence, element_at x k): element_at random access inside
    a lambda is ~12x slower on string arrays (measured at sf0.1:
    13.8 s -> 1.1 s for the k=5 corpus explode) — the same lesson the
    MinHash path's hashed shingles already encode. Output is identical
    (diff-tested), so the SQL mirror is unchanged."""
    t = tokens(col)
    n = F.size(t)
    blen = F.greatest(n - (k - 1), F.lit(0))
    chains = [F.slice(t, j + 1, blen) for j in range(k)]
    combined = chains[0]
    for nxt in chains[1:]:
        combined = F.zip_with(combined, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(
        F.when(n >= k, combined).otherwise(F.array(F.concat_ws(" ", t)))
    )


def shingles_over_tokens_sql(t: str = "t", k: int = 3) -> str:
    """DuckDB shingle expression over a token-list column named ``t``
    (callers bind ``t`` in a CTE: ``SELECT doc_id, <tokens_sql> AS t``)."""
    joined = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(CASE WHEN len({t}) >= {k} THEN "
        f"list_transform(range(1, len({t}) - {k - 2}), i -> {joined}) "
        f"ELSE [array_to_string({t}, ' ')] END)"
    )


def _sh_cte(table: str, text_expr: str, k: int = 3) -> str:
    """Shared CTE prefix: tokens then shingles."""
    return (
        f"tk AS (SELECT doc_id, {tokens_sql(text_expr)} AS t FROM {table}),\n"
        f"sh0 AS (SELECT doc_id, {shingles_over_tokens_sql('t', k)} AS sh FROM tk)"
    )


# ----------------------------------------------------- hashed shingles
#
# The MinHash scale path never materializes shingle STRINGS: tokens are
# md5-hashed once, k-gram shingle hashes are pure integer combinations
# (rolling 31x chain mod 2^31-1) — at sf0.1 this is ~4x faster than
# concat_ws-built string shingles + per-shingle md5, and the verify
# stage's intersect/union runs over int arrays. Identical formulas on the
# DuckDB side keep the oracle value-exact.

from pdf_extract_spark.operators.hashing import MOD  # noqa: E402


def _positional_gram_hashes(col, k: int):
    """POSITIONAL k-gram hash chain of a text column (one entry per gram
    position, order preserved, no dedup): token md5-hashes folded by the
    rolling 31x chain mod 2^31-1, with the whole-text hash as the
    shorter-than-k fallback. ONE definition shared by shingle_hashes
    (which array_distincts it) and winnow_hashes (which windows it) —
    the tricky cross-engine formulas live here once."""
    t = tokens(col)
    th = F.transform(t, lambda x: phash(x) % MOD)
    chains = [F.slice(th, j + 1, F.size(th) - (k - 1)) for j in range(k)]
    combined = chains[0]
    for nxt in chains[1:]:
        combined = F.zip_with(combined, nxt, lambda a, b: (a * 31 + b) % MOD)
    whole = F.array(
        F.aggregate(th, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % MOD)
    )
    return F.when(F.size(th) >= k, combined).otherwise(whole)


def shingle_hashes(col, k: int = 3):
    """array<long> of distinct k-gram shingle hashes of a text column."""
    return F.array_distinct(_positional_gram_hashes(col, k))


def _gram_chain_sql(k: int) -> tuple[str, str]:
    """(token-hash list expr builder input, positional gram chain expr
    over a list column named ``th``) — the SQL twin of
    _positional_gram_hashes' chain, shared by _shh_cte and _winnow_cte.
    Returns (grams_expr, whole_expr)."""
    combined = "th[i]"
    for j in range(1, k):
        combined = f"(({combined}) * 31 + th[i + {j}]) % {MOD}"
    grams = (
        f"CASE WHEN len(th) >= {k} THEN "
        f"list_transform(range(1, len(th) - {k - 2}), i -> {combined}) "
        f"ELSE [list_reduce(list_prepend(0::BIGINT, th), "
        f"(acc, x) -> (acc * 31 + x) % {MOD})] END"
    )
    whole = (
        f"[list_reduce(list_prepend(0::BIGINT, th), "
        f"(acc, x) -> (acc * 31 + x) % {MOD})]"
    )
    return grams, whole


def _shh_cte(table: str, text_expr: str, k: int = 3, prefix: str = "") -> str:
    """CTE prefix computing hashed shingles: token hashes ({prefix}th0)
    then k-gram integer combinations ({prefix}shh.sh) — formulas mirror
    shingle_hashes exactly. ``prefix`` disambiguates when two corpora
    need shingle CTEs in one query (minhash_lsh_pairs_between)."""
    th = f"list_transform({tokens_sql(text_expr)}, x -> {phash_sql('x')} % {MOD})"
    grams, _ = _gram_chain_sql(k)
    sh = f"list_distinct({grams})"
    return (
        f"{prefix}th0 AS (SELECT doc_id, {th} AS th FROM {table}),\n"
        f"{prefix}shh AS (SELECT doc_id, {sh} AS sh FROM {prefix}th0)"
    )


# ------------------------------------------------------- n-gram Jaccard

def jaccard_pairs(
    df: DataFrame, text_col: str = "text", k: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode shingles, self-join on
    shingle, aggregate intersection size, filter on |A∩B|/|A∪B| >= t.
    Returns (id_a, id_b, jaccard) with id_a < id_b."""
    sh = df.select(
        F.col("doc_id"), shingles(F.col(text_col), k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("doc_id", "n_sh", F.explode("sh").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6)
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_sql(
    table: str = "documents", text_expr: str = "text", k: int = 3, threshold: float = 0.6
) -> str:
    return f"""
WITH {_sh_cte(table, text_expr, k)},
ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh0),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, round(inter * 1.0 / (na + nb - inter), 6) AS jaccard
FROM inter WHERE round(inter * 1.0 / (na + nb - inter), 6) >= {threshold}
"""


# ---------------------------------------------------------- MinHash + LSH

N_HASHES = 16
N_BANDS = 4  # 4 rows per band


# arithmetic second-hash mix for the 2-hash minhash family over hashed
# shingles: h1 = s, h2 = (s*MIX_A + MIX_B) mod p, mh_i = (h1 + i*h2) mod p
MIX_A, MIX_B = 40503, 2531011


def _mh_i(sh_col, i: int):
    return F.array_min(
        F.transform(
            sh_col,
            lambda x: (x % MOD + F.lit(i) * ((x * MIX_A + MIX_B) % MOD)) % MOD,
        )
    )


def _mh_cols_sql() -> str:
    """SELECT-list computing mh_0..mh_{N-1} from a hashed-shingle column
    ``sh`` — shared by every minhash oracle so the 2-hash family lives in
    ONE place."""
    return ", ".join(
        f"list_min(list_transform(sh, x -> "
        f"(x % {MOD} + {i} * ((x * {MIX_A} + {MIX_B}) % {MOD})) % {MOD})) AS mh_{i}"
        for i in range(N_HASHES)
    )


def _band_rows_sql(sig: str) -> str:
    """UNION ALL expansion of a signature CTE into (doc_id, band_key)."""
    rows_per_band = N_HASHES // N_BANDS
    return " UNION ALL ".join(
        "SELECT doc_id, concat_ws('_', '{b}', {parts}) AS band_key FROM {sig}".format(
            b=b, sig=sig,
            parts=", ".join(
                f"mh_{b * rows_per_band + r}::VARCHAR" for r in range(rows_per_band)
            ),
        )
        for b in range(N_BANDS)
    )


def minhash_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, mh_0..mh_{N-1}): minimum over the document's HASHED
    shingles of the 2-hash family — one md5 per token, everything else
    integer arithmetic (no shingle strings materialized)."""
    sh = df.select("doc_id", shingle_hashes(F.col(text_col)).alias("sh"))
    return sh.select(
        "doc_id", *[_mh_i(F.col("sh"), i).alias(f"mh_{i}") for i in range(N_HASHES)]
    )


def minhash_merge(sigs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Merge minhash signatures by elementwise MIN — the sketch algebra
    that makes MinHash maintainable INCREMENTALLY: each mh_i is a min
    over the shingle set, and min distributes over set union, so the
    signature of (A ∪ B) is exactly the elementwise min of A's and B's
    signatures. A lake run therefore sketches only the NEW batch /
    chunk / snapshot and folds it into the stored corpus signatures —
    history is never re-tokenized (the reference re-reads everything
    per run, main.py's folder walk; a 100 TB lake cannot).

    Input: any relation with (key, mh_0..mh_{N-1}) rows, one per
    member (chunk signatures of a giant doc, daily batch signatures of
    a logical document, shard-local sketches). Output: one merged
    signature row per key. EXACTNESS: merged == minhash_signature over
    the UNION of the members' shingle sets (property-tested); it is NOT
    the signature of the concatenated text — k-grams spanning member
    boundaries don't exist in any member (documented approximation,
    negligible at word-gram k).

    Scale shape: ONE partial-combinable hash aggregate over 16-long
    rows — map-side combine reduces every partition to one row per
    local key before the only shuffle; no text, no arrays move."""
    return sigs.groupBy(key).agg(
        *[F.min(f"mh_{i}").alias(f"mh_{i}") for i in range(N_HASHES)]
    )


def minhash_merge_sql(
    table: str = "documents", text_expr: str = "text", group_expr: str = "doc_id",
    key_name: str = "doc_id",
) -> str:
    """DuckDB mirror of minhash_signature + minhash_merge where members
    are rows of ``table`` grouped by ``group_expr`` (the registered
    fixture groups the documents corpus into multi-member logical docs
    so every merge path fires)."""
    mins = ", ".join(f"min(mh_{i}) AS mh_{i}" for i in range(N_HASHES))
    return f"""
WITH {_shh_cte(table, text_expr)},
sig AS (SELECT doc_id, {_mh_cols_sql()} FROM shh)
SELECT {group_expr} AS {key_name}, {mins}
FROM sig GROUP BY 1
"""


def _band_keys_over(sh_col) -> list:
    rows_per_band = N_HASHES // N_BANDS
    mh = [_mh_i(sh_col, i) for i in range(N_HASHES)]
    return [
        F.concat_ws(
            "_", F.lit(str(b)),
            *[mh[b * rows_per_band + r].cast("string") for r in range(rows_per_band)],
        )
        for b in range(N_BANDS)
    ]


def _bands(hashed: DataFrame) -> DataFrame:
    """(doc_id, band_key) rows from a hashed-shingle table — the ONLY
    payload the band exchanges carry. ONE definition: the skew
    diagnostic (lsh_band_stats), the self-join, and the cross-corpus
    join must all see the same band keys or the diagnostic stops
    describing what the cap actually drops."""
    return hashed.select(
        "doc_id", F.explode(F.array(*_band_keys_over(F.col("sh")))).alias("band_key")
    )


def _cap_hot_bands(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """The degenerate-bucket guard: exclude band buckets holding more
    than ``max_bucket`` docs from candidate generation (a recall cap —
    record what it drops via lsh_band_stats, which shares _bands).

    Scale shape (r5): the bucket count is a WINDOW count over band_key —
    ONE Exchange hashpartitioning(band_key), which is exactly the
    partitioning the band self-join downstream needs, so the join adds
    no further Exchange and the second side resolves to a ReusedExchange
    (the corpus-sized minhash upstream is computed ONCE). The two shapes
    this replaces both recomputed that upstream a second time: a
    groupBy-sizes + anti-join needs its own aggregate exchange (partial
    rows, not reusable by the join), and broadcasting either key set is
    worse — the COLD set is corpus-sized (band keys are near-unique per
    doc, VERDICT r4 item 2), and even the bounded HOT set costs the
    extra pass. A degenerate bucket's rows do land in one window task,
    but the task is a linear spillable count over (band_key, doc_id)
    pairs and the bucket is dropped BEFORE the quadratic join — the
    right side of that trade at 100 TB."""
    if max_bucket is None:
        return bands
    w = Window.partitionBy("band_key")
    return (
        bands.withColumn("_n_docs", F.count("*").over(w))
        .filter(F.col("_n_docs") <= max_bucket)
        .drop("_n_docs")
    )


def lsh_band_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Band-bucket occupancy (band_key, n_docs) — the skew diagnostic for
    ``minhash_lsh_pairs(max_bucket=...)``: run it to see WHICH buckets a
    cap would drop before silently accepting reduced recall."""
    hashed = df.select("doc_id", shingle_hashes(F.col(text_col)).alias("sh"))
    return _bands(hashed).groupBy("band_key").agg(F.count("*").alias("n_docs"))


def _verify_jaccard(cand, left_hashed, right_hashed, id_a: str, id_b: str,
                    threshold: float):
    """Shared verify stage: join candidate id pairs back to each side's
    hashed-shingle table and keep pairs at or above the exact-Jaccard
    threshold. Both verify joins shuffle a shingle table by doc_id with
    identical subplans, so Spark's exchange reuse computes the self-join
    case once."""
    ha = left_hashed.alias("ha")
    hb = right_hashed.alias("hb")
    return (
        cand.join(ha, F.col(id_a) == F.col("ha.doc_id"))
        .join(hb, F.col(id_b) == F.col("hb.doc_id"))
        .select(
            id_a, id_b,
            F.round(
                F.size(F.array_intersect("ha.sh", "hb.sh"))
                / F.size(F.array_union("ha.sh", "hb.sh")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs + exact Jaccard verification over hashed
    shingles.

    Bands of N_HASHES/N_BANDS rows; a pair is a candidate if any band's
    signature slice matches; candidates verified with exact Jaccard over
    the (distinct) shingle-hash sets.

    Shuffle discipline (the 100 TB shape): the band self-join carries ONLY
    (band_key, doc_id) — the shingle arrays never ride the band exchange.
    The (much smaller) deduplicated candidate set then joins back to the
    shingle table twice for the verify; both verify joins shuffle the
    shingle table by doc_id with identical subplans, so Spark's exchange
    reuse computes/shuffles it once. Total shuffle volume drops from
    O(bands x shingles) to O(shingles + candidates).

    ``max_bucket`` is the degenerate-bucket guard: boilerplate/near-empty
    corpora put thousands of docs into ONE band bucket, degrading the band
    join to the all-pairs quadratic it exists to avoid. With the cap set,
    buckets holding more than ``max_bucket`` docs are EXCLUDED from
    candidate generation (pairs may still surface via the pair's other
    bands). This is a recall cap, not a silent one — use
    ``lsh_band_stats`` to record which buckets were dropped.
    Returns (id_a, id_b, jaccard)."""
    hashed = df.select("doc_id", shingle_hashes(F.col(text_col)).alias("sh"))
    bands = _cap_hot_bands(_bands(hashed), max_bucket)
    if max_bucket is None:
        # materialize the band table as ONE shuffle stage before the
        # self-join: without an exchange boundary the join's second side
        # RECOMPUTES the corpus-sized shingle+minhash upstream (measured
        # 5.84 s -> 3.28 s median at sf0.1, 5 interleaved warm reps).
        # The join needs hashpartitioning(band_key) anyway, so this adds
        # no shuffle a scale run wouldn't pay. The capped path already
        # carries the exchange via its window count.
        bands = bands.repartition("band_key")
    a = bands.alias("a")
    b_ = bands.alias("b")
    cand = (
        a.join(b_, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # same pair may share several bands
    )
    return _verify_jaccard(cand, hashed, hashed, "id_a", "id_b", threshold)


def minhash_lsh_pairs_sql(
    table: str = "documents", text_expr: str = "text", threshold: float = 0.5,
    max_bucket: int | None = None,
) -> str:
    """DuckDB twin of minhash_lsh_pairs. With ``max_bucket`` the cand
    CTE excludes band keys holding more than that many docs — the same
    recall cap the Spark side applies via _cap_hot_bands' window count
    (a NOT IN subquery expresses it most directly in SQL; the Spark
    plan shape is pinned separately in test_plans.py)."""
    cap_cte, cand_src = "", "bands"
    if max_bucket is not None:
        cap_cte = (
            f"hot AS (SELECT band_key FROM bands "
            f"GROUP BY band_key HAVING count(*) > {max_bucket}),\n"
            "bands_ok AS (SELECT * FROM bands "
            "WHERE band_key NOT IN (SELECT band_key FROM hot)),\n"
        )
        cand_src = "bands_ok"
    return f"""
WITH {_shh_cte(table, text_expr)},
sig AS (SELECT doc_id, {_mh_cols_sql()} FROM shh),
bands AS ({_band_rows_sql("sig")}),
{cap_cte}cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM {cand_src} a JOIN {cand_src} b
         ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
verified AS (
  SELECT id_a, id_b,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
               len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
  FROM cand JOIN shh sa ON sa.doc_id = cand.id_a
            JOIN shh sb ON sb.doc_id = cand.id_b)
SELECT * FROM verified WHERE jaccard >= {threshold}
"""


def lsh_band_stats_sql(
    table: str = "documents", text_expr: str = "text", min_docs: int = 1
) -> str:
    """DuckDB twin of lsh_band_stats (optionally restricted to buckets
    holding at least ``min_docs`` docs — the dropped-bucket audit for a
    ``max_bucket`` cap uses min_docs = cap + 1)."""
    return f"""
WITH {_shh_cte(table, text_expr)},
sig AS (SELECT doc_id, {_mh_cols_sql()} FROM shh),
bands AS ({_band_rows_sql("sig")})
SELECT band_key, count(*) AS n_docs FROM bands
GROUP BY band_key HAVING count(*) >= {min_docs}
"""


# ----------------------------------------------------- LSH S-curve tuning
#
# Choosing (bands, rows) is THE MinHash design decision: the candidate
# probability of a pair at Jaccard j under b bands of r rows is the
# S-curve p(j) = 1 - (1 - j^r)^b. The planner below evaluates every
# (b, r) split of the N_HASHES budget against the corpus's MEASURED
# Jaccard distribution, so the choice is made on evidence, not folklore
# (the reference hard-codes its batch geometry once, utils.py:40-106;
# a Spark-first pipeline re-tunes per corpus).

# every (n_bands, rows_per_band) factorization of the signature budget
LSH_CONFIG_GRID = [
    (b, N_HASHES // b) for b in (1, 2, 4, 8, 16) if b * (N_HASHES // b) == N_HASHES
]

_SCURVE_DENOM = 100 ** N_HASHES  # centi-Jaccard denominator, (10^2)^16 = 10^32


def _scurve_milli_spark(r: int, b: int) -> str:
    """Spark SQL expression: milli detection probability of the S-curve
    1 - (1 - j^r)^b at a CENTI-quantized Jaccard column ``jc`` — exact
    integer arithmetic (decimal(38,0) intermediates peak at 1000 * 10^32
    = 10^35 < 10^38; powers are explicit multiply chains, never pow(),
    so both engines execute the identical integer sequence)."""
    jr = " * ".join(["CAST(jc AS DECIMAL(38,0))"] * r)
    term = f"(CAST({100 ** r} AS DECIMAL(38,0)) - ({jr}))"
    tb = " * ".join([term] * b)
    return (
        f"(1000 - CAST(1000 AS DECIMAL(38,0)) * ({tb})"
        f" DIV CAST({_SCURVE_DENOM} AS DECIMAL(38,0)))"
    )


def _scurve_milli_duck(r: int, b: int) -> str:
    """DuckDB twin of _scurve_milli_spark (HUGEINT carries 10^35)."""
    jr = " * ".join(["jc::HUGEINT"] * r)
    term = f"({100 ** r}::HUGEINT - ({jr}))"
    tb = " * ".join([term] * b)
    return f"(1000 - (1000::HUGEINT * ({tb})) // {_SCURVE_DENOM}::HUGEINT)"


def lsh_tuning_plan(
    df: DataFrame, text_col: str = "text", k: int = 3, threshold_centi: int = 50
) -> DataFrame:
    """Evidence-based (bands, rows) planner for the MinHash-LSH family.

    Measures the EXACT hashed-shingle Jaccard of every co-shingled pair
    in ``df`` (pairs sharing zero shingles have p(j)=0 under every
    config, so excluding them is exact, not an approximation), quantizes
    to centi (jc = (100*|A∩B|) DIV |A∪B|), and evaluates each
    (n_bands, rows_per_band) split of the N_HASHES signature budget on
    the resulting <=101-row histogram. Per config:

      * exp_cands_milli  — expected LSH candidate pairs x1000 (join cost)
      * recall_milli     — mean detection probability x1000 over measured
                           pairs at/above the threshold (what the config
                           would CATCH of the true near-dups)
      * falsepos_milli   — mean candidate probability x1000 over pairs
                           below it (what it would WASTE verifying)

    All integer-exact: the S-curve runs in decimal(38,0) multiply chains
    (engine-identical), sums are over bigints (order-free), and the two
    trunc divisions are the only divisions anywhere.

    Scale shape (100 TB): the quadratic exact-pair measurement is the
    documented TUNING-SAMPLE step — feed a bounded deterministic slice
    (the registered query's corpus is itself that sample); everything
    after the pair aggregate is arithmetic over a bounded histogram.
    The production default (N_BANDS={nb}, rows={r}) appears as one grid
    row, so the operating point is always visible in the report."""
    sh = df.select(
        "doc_id", shingle_hashes(F.col(text_col), k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("doc_id", "n_sh", F.explode("sh").alias("s"))
    a, b_ = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b_, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    # the five grid branches each aggregate this histogram; without a
    # checkpoint every branch recomputes the corpus-sized pair join
    # upstream (measured: 0 ReusedExchange across the union) — the
    # dedup_components discipline: materialize the loop-invariant input
    # ONCE (<=101 rows) and let the branches scan that
    hist = (
        pairs.select(F.expr("(inter * 100) DIV (na + nb - inter)").alias("jc"))
        .groupBy("jc")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint()
    )
    above = F.col("jc") >= threshold_centi
    parts = []
    for nb_, r in LSH_CONFIG_GRID:
        pm = F.expr(_scurve_milli_spark(r, nb_)).cast("long")
        agg = hist.agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.sum(F.when(above, F.col("n"))), F.lit(0))
            .cast("long").alias("n_above"),
            F.coalesce(F.sum(F.col("n") * pm), F.lit(0))
            .cast("long").alias("exp_cands_milli"),
            F.coalesce(F.sum(F.when(above, F.col("n") * pm)), F.lit(0))
            .cast("long").alias("s_above"),
            F.coalesce(F.sum(F.when(~above, F.col("n") * pm)), F.lit(0))
            .cast("long").alias("s_below"),
        )
        parts.append(
            agg.select(
                F.lit(nb_).cast("long").alias("n_bands"),
                F.lit(r).cast("long").alias("rows_per_band"),
                "n_pairs",
                "n_above",
                "exp_cands_milli",
                F.when(F.col("n_above") > 0, F.expr("s_above DIV n_above"))
                .cast("long").alias("recall_milli"),
                F.when(
                    F.col("n_pairs") - F.col("n_above") > 0,
                    F.expr("s_below DIV (n_pairs - n_above)"),
                ).cast("long").alias("falsepos_milli"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("n_bands")


if lsh_tuning_plan.__doc__:  # absent under python -OO
    lsh_tuning_plan.__doc__ = lsh_tuning_plan.__doc__.format(
        nb=N_BANDS, r=N_HASHES // N_BANDS
    )


def lsh_tuning_plan_sql(
    table: str = "documents", text_expr: str = "text", k: int = 3,
    threshold_centi: int = 50,
) -> str:
    """DuckDB twin of lsh_tuning_plan (HUGEINT multiply chains mirror the
    decimal(38,0) ones; `//` == DIV for the all-non-negative operands)."""
    selects = []
    for nb_, r in LSH_CONFIG_GRID:
        pm = _scurve_milli_duck(r, nb_)
        selects.append(f"""
SELECT {nb_}::BIGINT AS n_bands, {r}::BIGINT AS rows_per_band,
       coalesce(sum(n), 0)::BIGINT AS n_pairs,
       coalesce(sum(CASE WHEN jc >= {threshold_centi} THEN n END), 0)::BIGINT AS n_above,
       coalesce(sum(n::HUGEINT * {pm}), 0)::BIGINT AS exp_cands_milli,
       (CASE WHEN coalesce(sum(CASE WHEN jc >= {threshold_centi} THEN n END), 0) > 0
             THEN coalesce(sum(CASE WHEN jc >= {threshold_centi}
                                    THEN n::HUGEINT * {pm} END), 0)
                  // sum(CASE WHEN jc >= {threshold_centi} THEN n END)
        END)::BIGINT AS recall_milli,
       (CASE WHEN coalesce(sum(CASE WHEN jc < {threshold_centi} THEN n END), 0) > 0
             THEN coalesce(sum(CASE WHEN jc < {threshold_centi}
                                    THEN n::HUGEINT * {pm} END), 0)
                  // sum(CASE WHEN jc < {threshold_centi} THEN n END)
        END)::BIGINT AS falsepos_milli
FROM hist""")
    body = " UNION ALL ".join(selects)
    return f"""
WITH {_shh_cte(table, text_expr, k)},
ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM shh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS inter
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
hist AS (
  SELECT (inter * 100) // (na + nb - inter) AS jc, count(*)::BIGINT AS n
  FROM inter GROUP BY 1)
{body}
ORDER BY n_bands
"""


# ----------------------------------------------- cross-corpus near-dup
#
# The incremental-ingest shape: dedup a NEW batch against the EXISTING
# lake without self-joining either side. Same banded-LSH discipline —
# the cross band join carries only (band_key, doc_id); the deduplicated
# (id_l, id_r) candidates join back to each side's shingle table once.

def minhash_lsh_pairs_between(
    left: DataFrame, right: DataFrame, text_col: str = "text",
    threshold: float = 0.5, max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora (left doc vs right doc only).
    Returns (id_l, id_r, jaccard). ``max_bucket`` caps hot band buckets
    on the (usually much larger) right/corpus side."""
    lh = left.select("doc_id", shingle_hashes(F.col(text_col)).alias("sh"))
    rh = right.select("doc_id", shingle_hashes(F.col(text_col)).alias("sh"))
    lb = _bands(lh)
    rb = _cap_hot_bands(_bands(rh), max_bucket)
    cand = (
        lb.alias("l").join(rb.alias("r"), "band_key")
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    return _verify_jaccard(cand, lh, rh, "id_l", "id_r", threshold)


def minhash_lsh_pairs_between_sql(
    left_table: str, right_table: str, text_expr: str = "text",
    threshold: float = 0.5,
) -> str:
    return f"""
WITH {_shh_cte(left_table, text_expr, prefix="l")},
{_shh_cte(right_table, text_expr, prefix="r")},
lsig AS (SELECT doc_id, {_mh_cols_sql()} FROM lshh),
rsig AS (SELECT doc_id, {_mh_cols_sql()} FROM rshh),
lbands AS ({_band_rows_sql("lsig")}),
rbands AS ({_band_rows_sql("rsig")}),
cand AS (SELECT DISTINCT l.doc_id AS id_l, r.doc_id AS id_r
         FROM lbands l JOIN rbands r ON l.band_key = r.band_key),
verified AS (
  SELECT id_l, id_r,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
               len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
  FROM cand JOIN lshh sa ON sa.doc_id = cand.id_l
            JOIN rshh sb ON sb.doc_id = cand.id_r)
SELECT * FROM verified WHERE jaccard >= {threshold}
"""


# --------------------------------------------------- decontamination
#
# Benchmark decontamination for pretraining corpora: flag every corpus
# document that shares ANY word k-gram with an evaluation/benchmark
# corpus (the GPT-3 appendix-C / PaLM n-gram-collision rule), plus the
# matched-gram fraction for graded policies. The reference has no eval
# sets to protect (it extracts, it doesn't train), so this is a
# first-class training-pipeline addition, not a parity item.
#
# Scale (100 TB corpus, FIXED-size benchmark): the eval k-gram set is
# distinct-ed over the small benchmark relation and broadcast; the
# corpus side explodes to (doc_id, gram) map-side and hits come from a
# BroadcastHashJoin — the corpus is never shuffled by gram. The only
# corpus Exchange is the final groupBy(doc_id) re-aggregation (and AQE
# collapses even that when the explode preserves a usable partitioning).


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document contamination verdict against an eval corpus.

    Returns (doc_id, n_grams, n_hits, contam_frac, is_contaminated)
    where grams are DISTINCT word k-grams (``shingles``; documents
    shorter than k tokens contribute their whole text as one gram) and
    is_contaminated = any collision. k=5 is the measured knee on the
    synthetic corpus: k=4 still random-collides (19/490 docs at
    sf0.01), k>=5 flags only the genuinely shared passage (1/490)."""
    ev = (
        eval_docs.select(F.explode(shingles(F.col(text_col), k)).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ng = docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("g"))
    return (
        ng.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("hit").cast("long").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("contam_frac"),
            (F.col("n_hits") > 0).alias("is_contaminated"),
        )
    )


def decontaminate_sql(
    corpus_pred: str, eval_pred: str, table: str = "documents",
    text_expr: str = "text", k: int = 5,
) -> str:
    """DuckDB mirror of ``decontaminate`` where the corpus and eval
    relations are predicate-selected slices of one table (how the
    registered query derives its deterministic benchmark)."""
    return f"""
WITH {_sh_cte(table, text_expr, k)},
gr AS (SELECT doc_id, unnest(sh) AS g FROM sh0),
ev AS (SELECT DISTINCT g FROM gr WHERE {eval_pred}),
ng AS (SELECT doc_id, g FROM gr WHERE {corpus_pred})
SELECT ng.doc_id,
       count(*)::BIGINT AS n_grams,
       count(ev.g)::BIGINT AS n_hits,
       round(count(ev.g) * 1.0 / count(*), 6) AS contam_frac,
       (count(ev.g) > 0) AS is_contaminated
FROM ng LEFT JOIN ev ON ng.g = ev.g
GROUP BY 1
"""


def decontaminate_fuzzy(
    docs: DataFrame, eval_docs: DataFrame, text_col: str = "text",
    threshold: float = 0.5, max_bucket: int | None = None,
) -> DataFrame:
    """NEAR-DUP benchmark decontamination: flag corpus documents whose
    shingle-set Jaccard against ANY eval/benchmark document reaches
    ``threshold`` — the precision-graded sibling of ``decontaminate``.

    The exact any-k-gram-collision rule is maximally sensitive but
    over-flags: one shared idiom or boilerplate run marks an otherwise
    unrelated document contaminated. Set-level Jaccard grades the
    overlap instead, firing only on documents that substantially
    reproduce benchmark text (lightly edited / template-padded copies)
    while incidental-phrase collisions survive — the knob real curation
    runs tune when exact decontamination costs too much corpus.

    Scale shape (100 TB corpus, FIXED-size benchmark): the eval side is
    the LEFT of ``minhash_lsh_pairs_between``, so its band table is tiny
    (eval_rows x N_BANDS) and the cross band join broadcasts it; the
    corpus is never self-joined and only its (band_key, doc_id)
    projection rides the candidate join. ``max_bucket`` caps hot
    corpus-side band buckets exactly as on the dedup path. The verdict
    join back to ``docs`` is against the (bounded-by-matches) per-doc
    aggregate, broadcast by AQE.

    Returns (doc_id, n_eval_matches, max_jaccard, is_contaminated), one
    row per corpus document."""
    pairs = minhash_lsh_pairs_between(
        eval_docs, docs, text_col=text_col, threshold=threshold,
        max_bucket=max_bucket,
    )
    agg = pairs.groupBy(F.col("id_r").alias("doc_id")).agg(
        F.count("*").cast("long").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_eval_matches", F.lit(0).cast("long")).alias("n_eval_matches"),
        F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
        (F.coalesce("n_eval_matches", F.lit(0)) > 0).alias("is_contaminated"),
    )


def decontaminate_fuzzy_sql(
    corpus_table: str = "documents", eval_table: str = "documents",
    text_expr: str = "text", threshold: float = 0.5,
) -> str:
    """DuckDB twin of decontaminate_fuzzy; either table may be a
    subquery (the registered fixture derives its eval benchmark as a
    mutated slice of ``documents``)."""
    between = minhash_lsh_pairs_between_sql(
        eval_table, corpus_table, text_expr=text_expr, threshold=threshold
    )
    return f"""
WITH pairs AS ({between}),
agg AS (SELECT id_r AS doc_id, count(*)::BIGINT AS n_eval_matches,
               max(jaccard) AS max_jaccard
        FROM pairs GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_eval_matches, 0)::BIGINT AS n_eval_matches,
       coalesce(a.max_jaccard, 0.0) AS max_jaccard,
       (coalesce(a.n_eval_matches, 0) > 0) AS is_contaminated
FROM {corpus_table} d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def eval_contamination(
    docs: DataFrame, eval_docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-EVAL-document contamination report — the inverse direction of
    ``decontaminate`` and the one a model/data card actually publishes
    ("benchmark X: n% of examples appear in the training corpus",
    GPT-3 App. C's contaminated-eval tables). For every eval document:
    how many of its distinct word k-grams occur anywhere in the corpus,
    and how many distinct corpus documents collide with it.

    Returns (doc_id, n_grams, n_hit_grams, n_corpus_docs, contam_frac,
    is_contaminated), one row per EVAL document (doc_id is the eval
    doc's id).

    Scale shape (100 TB corpus, FIXED-size benchmark): the eval
    (doc_id, gram) relation is bounded by the benchmark, so it
    BROADCASTS and the corpus-sized gram stream filters against it
    map-side — the corpus is never shuffled by gram (same discipline as
    ``decontaminate``, plan-pinned). The post-join aggregate is keyed by
    eval doc_id (bounded), and its two COUNT(DISTINCT)s run over the
    matches only (bounded by benchmark grams x colliding docs), never
    over the corpus. The final totals join is between two relations
    each bounded by the benchmark row count, so the hit side is
    broadcast explicitly rather than left to AQE."""
    ev = eval_docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), k)).alias("g")
    )
    tot = ev.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    cg = docs.select(
        F.col("doc_id").alias("cid"), F.explode(shingles(F.col(text_col), k)).alias("g")
    )
    hits = (
        cg.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("long").alias("n_hit_grams"),
            F.countDistinct("cid").cast("long").alias("n_corpus_docs"),
        )
    )
    return tot.join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_hit_grams", F.lit(0).cast("long")).alias("n_hit_grams"),
        F.coalesce("n_corpus_docs", F.lit(0).cast("long")).alias("n_corpus_docs"),
        F.round(
            F.coalesce("n_hit_grams", F.lit(0).cast("long")) / F.col("n_grams"), 6
        ).alias("contam_frac"),
        (F.coalesce("n_hit_grams", F.lit(0).cast("long")) > 0).alias(
            "is_contaminated"
        ),
    )


def eval_contamination_sql(
    corpus_pred: str, eval_pred: str, table: str = "documents",
    text_expr: str = "text", k: int = 5,
) -> str:
    """DuckDB mirror of ``eval_contamination`` where the corpus and eval
    relations are predicate-selected slices of one table (mirrors
    decontaminate_sql's fixture derivation)."""
    return f"""
WITH {_sh_cte(table, text_expr, k)},
gr AS (SELECT doc_id, unnest(sh) AS g FROM sh0),
ev AS (SELECT doc_id, g FROM gr WHERE {eval_pred}),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM ev GROUP BY 1),
cg AS (SELECT doc_id AS cid, g FROM gr WHERE {corpus_pred}),
hit AS (SELECT ev.doc_id,
               count(DISTINCT ev.g)::BIGINT AS n_hit_grams,
               count(DISTINCT cg.cid)::BIGINT AS n_corpus_docs
        FROM ev JOIN cg ON ev.g = cg.g GROUP BY 1)
SELECT t.doc_id, t.n_grams,
       coalesce(h.n_hit_grams, 0)::BIGINT AS n_hit_grams,
       coalesce(h.n_corpus_docs, 0)::BIGINT AS n_corpus_docs,
       round(coalesce(h.n_hit_grams, 0) * 1.0 / t.n_grams, 6) AS contam_frac,
       (coalesce(h.n_hit_grams, 0) > 0) AS is_contaminated
FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
"""


# ----------------------------------------------------------------- SimHash

SIMHASH_BITS = 32


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over word tokens: bit b of the hash is 1 iff the sum
    over tokens of (+1 if bit b of token-hash set else -1) is positive."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    th = df.select("doc_id", F.explode(toks).alias("tok")).select(
        "doc_id", phash(F.col("tok")).alias("h")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b")
    # shiftright/shiftleft take a literal bit count in the python API, so
    # column-valued shifts go through expr()
    bits = th.select("doc_id", "h", bit).select(
        "doc_id",
        "b",
        F.when(F.expr("(h >> b) & 1") == 1, 1).otherwise(-1).alias("w"),
    )
    agg = bits.groupBy("doc_id", "b").agg(F.sum("w").alias("s"))
    return agg.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)")).otherwise(0)).alias("simhash")
    )


def simhash_sql(table: str = "documents", text_expr: str = "text") -> str:
    toks = f"list_distinct({tokens_sql(text_expr)})"
    h = phash_sql("tok")
    return f"""
WITH th AS (SELECT doc_id, {h} AS h
            FROM (SELECT doc_id, unnest({toks}) AS tok FROM {table})),
bits AS (SELECT doc_id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS w
         FROM th, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b)),
agg AS (SELECT doc_id, b, sum(w) AS s FROM bits GROUP BY 1, 2)
SELECT doc_id,
       (sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
FROM agg GROUP BY 1
"""


# ------------------------------------------------- component resolution
#
# Pairwise near-dup output (any family above) still needs RESOLUTION:
# "keep one doc per duplicate CLUSTER", where clusters are the connected
# components of the pair graph (a~b, b~c => {a,b,c} even if a,c never
# paired directly). Each round does min-label propagation over edges
# PLUS pointer jumping (adopt the label of your current label), so label
# distances halve per round and convergence is O(log diameter) — a
# 30-hop revision chain resolves in ~5 rounds, not 30. Each round is two
# shuffle joins + map-side min aggregates; only the scalar `changed`
# count reaches the driver.

def dedup_components(
    pairs: DataFrame, universe: DataFrame | None = None,
    id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into clusters: returns (doc_id, component,
    is_keeper) where component = min doc_id reachable through the pair
    graph and the keeper is the component representative (keep-first
    semantics, A7). ``universe`` optionally supplies the full doc_id set
    so unpaired docs appear as singleton components."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # materialize ONCE: edges joins into every round, and without this
    # each round would recompute the whole upstream pair lineage (for
    # minhash input, that's the full candidate generation per iteration
    # — an O(rounds x corpus) recompute at scale, and measured ~5x wall
    # on the composed curate_corpus query at sf0.1)
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("comp"))
    )
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("cand"))
        )
        new_labels = (
            labels.join(prop, labels["id"] == prop["dst"], "left")
            .select(
                labels["id"].alias("id"),
                F.least(F.col("comp"), F.coalesce(F.col("cand"), F.col("comp"))).alias("comp"),
            )
        )
        # pointer jumping: comp <- comp[comp] (labels are node ids, so a
        # label's own current label is a valid, smaller-or-equal label
        # for everything pointing at it) — halves label distance per round
        lut = new_labels.select(
            F.col("id").alias("cid"), F.col("comp").alias("ccomp")
        )
        new_labels = (
            new_labels.join(lut, new_labels["comp"] == lut["cid"], "left")
            .select(
                new_labels["id"].alias("id"),
                F.least(
                    new_labels["comp"], F.coalesce(F.col("ccomp"), new_labels["comp"])
                ).alias("comp"),
            )
        )
        # truncate the iterative lineage so plan depth stays bounded
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing) — the pair graph has "
            "a component with diameter > max_iter (e.g. a long revision "
            "chain); raise max_iter rather than accept a silently split "
            "cluster"
        )

    out = labels
    if universe is not None:
        singles = (
            universe.select(F.col("doc_id").alias("id")).distinct()
            .join(labels.select("id"), "id", "left_anti")
            .select("id", F.col("id").alias("comp"))
        )
        out = labels.unionByName(singles)
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("id") == F.col("comp")).alias("is_keeper"),
    )


def dedup_components_ctes(pairs_cte: str, table: str = "documents") -> str:
    """The transitive-closure CTE chain (edges/reach/comp/allc) as a
    composable body — curate_corpus_sql splices it into a larger
    WITH RECURSIVE statement. ``pairs_cte`` must define a CTE named
    ``pairs`` with columns id_a, id_b; ``allc`` ends up holding
    (doc_id, component) for every row of ``table``."""
    return f"""{pairs_cte},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
    SELECT src, src FROM edges
  UNION
    SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY 1),
allc AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM {table} d LEFT JOIN comp c ON c.id = d.doc_id)"""


def dedup_components_sql(
    pairs_cte: str, table: str = "documents"
) -> str:
    """DuckDB mirror via a recursive transitive-closure CTE over the same
    pair set (``pairs_cte`` must define a CTE named ``pairs`` with
    columns id_a, id_b)."""
    return f"""
WITH RECURSIVE {dedup_components_ctes(pairs_cte, table)}
SELECT doc_id, component, doc_id = component AS is_keeper FROM allc
"""


def component_stats(labels: DataFrame) -> DataFrame:
    """Cluster-size histogram of a components labeling — the audit a run
    reads BEFORE committing a dedup threshold: for each cluster size,
    how many clusters exist, how many docs they hold, and how many rows
    keep-first dedup would remove (size - 1 per cluster). Input is any
    (doc_id, component) labeling (dedup_components output, either
    corpus).

    Scale (100 TB): two count-only aggregates, both partial-combinable —
    the first keyed on component (near-unique, unskewed by
    construction: labels are min doc_ids), the second on the
    low-cardinality size where map-side combine collapses each
    partition to at most |distinct sizes| rows before the shuffle, so
    the histogram of a 10^12-doc labeling moves only (component) then
    (size, partial count)."""
    sizes = labels.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters")
    )
    return hist.select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.col("n_clusters")).cast("long").alias("n_removed"),
    )


def component_stats_sql(pairs_cte: str, table: str = "documents") -> str:
    """DuckDB mirror of minhash pairs -> dedup_components ->
    component_stats (``pairs_cte`` must define a CTE named ``pairs``
    with columns id_a, id_b; the closure CTEs come from
    dedup_components_ctes so the labeling is the oracle-identical
    one)."""
    return f"""
WITH RECURSIVE {dedup_components_ctes(pairs_cte, table)},
csz AS (SELECT component, count(*)::BIGINT AS cluster_size
        FROM allc GROUP BY 1)
SELECT cluster_size,
       count(*)::BIGINT AS n_clusters,
       (cluster_size * count(*))::BIGINT AS n_docs,
       ((cluster_size - 1) * count(*))::BIGINT AS n_removed
FROM csz GROUP BY 1
"""


def split_leakage(labels: DataFrame, assigned: DataFrame) -> DataFrame:
    """Cross-split near-dup leakage audit — the check a training run
    makes AFTER splitting and BEFORE trusting its eval numbers: a
    held-out document whose near-duplicate sits in train is measuring
    memorization, not generalization (the within-corpus twin of
    benchmark decontamination). A document LEAKS when its near-dup
    cluster contains a member assigned to a DIFFERENT split; singleton
    documents can never leak.

    Inputs: ``labels`` = (doc_id, component) — a ``dedup_components``
    labeling over the full universe; ``assigned`` = (doc_id, split) —
    ``split_assign`` output. Returns one row per split:
    (split, n_docs, n_dup_docs, n_leaked, leak_milli) where n_dup_docs
    counts members of any >1-doc cluster and leak_milli is the integer
    milli leaked fraction (trunc division, engine-exact).

    Scale (100 TB): the only corpus-sized relations carry (doc_id,
    component, split) — never text. The cluster aggregate is
    partial-combinable on the near-unique component key (a giant
    boilerplate family is ONE hot key into a count aggregate — combined
    map-side, not a window); the stats rejoin carries three short
    columns and AQE's skew handling splits the giant component's probe
    side if needed; the final aggregate is keyed on the handful of
    split names AFTER map-side combine collapses each partition to
    |splits| rows."""
    j = labels.select("doc_id", "component").join(
        assigned.select("doc_id", "split"), "doc_id"
    )
    comp = j.groupBy("component").agg(
        F.count("*").cast("long").alias("csize"),
        F.count_distinct("split").cast("long").alias("n_splits"),
    )
    per_doc = j.join(comp, "component")
    return (
        per_doc.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("csize") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_leaked"),
        )
        .select(
            "split",
            "n_docs",
            "n_dup_docs",
            "n_leaked",
            F.expr("n_leaked * 1000 DIV n_docs")
            .cast("long")
            .alias("leak_milli"),
        )
    )


def split_leakage_sql(
    pairs_cte: str,
    table: str = "documents",
    fractions: tuple[tuple[str, int], ...] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """DuckDB mirror: the dedup_components closure CTEs + the
    split_assign hash CASE + the same two aggregates (``pairs_cte``
    must define a CTE named ``pairs`` with columns id_a, id_b; n_docs
    is never zero inside a group so the trunc division is total).
    ``fractions=None`` resolves to ``textstats.SPLIT_FRACTIONS`` — the
    same tuple ``split_assign`` defaults to — so twins composed with
    defaults on both sides can never diverge on bucket boundaries."""
    from pdf_extract_spark.operators.textstats import (
        SPLIT_FRACTIONS, split_assign_sql,
    )

    if fractions is None:
        fractions = SPLIT_FRACTIONS

    asg = split_assign_sql(
        fractions=fractions, table=table, key_col=key_col, salt=salt
    )
    return f"""
WITH RECURSIVE {dedup_components_ctes(pairs_cte, table)},
asg AS (SELECT doc_id, split FROM ({asg.strip()})),
lj AS (SELECT allc.doc_id, allc.component, asg.split
       FROM allc JOIN asg ON allc.doc_id = asg.doc_id),
cst AS (SELECT component, count(*)::BIGINT AS csize,
               count(DISTINCT split)::BIGINT AS n_splits
        FROM lj GROUP BY 1)
SELECT split,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
       sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaked,
       (sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) * 1000
        // count(*))::BIGINT AS leak_milli
FROM lj JOIN cst USING (component)
GROUP BY split
"""



def split_assign_clustered(
    labels: DataFrame,
    fractions: tuple[tuple[str, int], ...] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Leakage-PROOF split assignment — the repair counterpart of the
    ``split_leakage`` audit (the decontaminate/eval_contamination
    pattern: one operator measures the defect, its sibling removes it):
    hash the near-dup CLUSTER label instead of the document id, so
    every member of a component lands in the same split and cross-split
    leakage is zero BY CONSTRUCTION — ``split_leakage`` over the result
    reads n_leaked = 0 on every split, not because the hash got lucky
    but because a cluster cannot straddle what it is atomically
    assigned to.

    Because ``dedup_components`` labels each cluster with its minimum
    reachable doc_id, a singleton's label IS its own doc_id: singleton
    documents receive exactly the split plain ``split_assign`` gives
    them, and only members of >1-doc clusters move (they adopt their
    cluster representative's split). Split SIZES stay within the
    requested basis points up to cluster granularity — a giant
    boilerplate family lands whole in one split, which is precisely
    the guarantee eval integrity demands.

    Input: ``labels`` = (doc_id, component), a ``dedup_components``
    labeling over the full universe. ``fractions=None`` resolves to
    ``textstats.SPLIT_FRACTIONS`` (the split_assign default) on BOTH
    engines. Returns (doc_id, component, split_bucket, split).

    Scale (100 TB): a pure map-side projection over the labeling (the
    split_assign hash CASE evaluated on the component key) — ZERO
    Exchange beyond what produced the labels; no join, no window;
    document text never appears (plan-pinned in
    tests/test_split_clustered.py).
    """
    from pdf_extract_spark.operators.textstats import (
        SPLIT_FRACTIONS,
        split_assign,
    )

    if fractions is None:
        fractions = SPLIT_FRACTIONS
    return split_assign(
        labels.select("doc_id", "component"),
        fractions=fractions,
        key_col="component",
        salt=salt,
    )


def split_assign_clustered_sql(
    pairs_cte: str,
    table: str = "documents",
    fractions: tuple[tuple[str, int], ...] | None = None,
    salt: str = "split",
) -> str:
    """DuckDB mirror: the dedup_components closure CTEs + the
    split_assign hash CASE keyed on the component label (allc is
    projected to (doc_id, component) first so the output schema matches
    the kernel's SELECT * exactly; fractions=None resolves to
    textstats.SPLIT_FRACTIONS on both sides — the split_leakage_sql
    discipline, so default-composed twins can never diverge on bucket
    boundaries)."""
    from pdf_extract_spark.operators.textstats import (
        SPLIT_FRACTIONS,
        split_assign_sql,
    )

    if fractions is None:
        fractions = SPLIT_FRACTIONS
    inner = split_assign_sql(
        fractions=fractions,
        table="(SELECT doc_id, component FROM allc)",
        key_col="component",
        salt=salt,
    )
    return f"""
WITH RECURSIVE {dedup_components_ctes(pairs_cte, table)}
{inner.strip()}
"""


# -------------------------------------------------------- line-level dedup

def dedup_lines(
    df: DataFrame, text_col: str = "text", min_count: int = 3
) -> DataFrame:
    """Corpus-level duplicated-line removal (the RefinedWeb/CCNet web
    curation step the document-level families above can't express: nav
    bars, cookie banners and share-button rows repeat across PAGES while
    each page stays globally unique).

    A line is removed from EVERY document when its trimmed form occurs
    ``min_count``-or-more times across the whole corpus; blank lines are
    never counted and never removed (they are document structure).
    Returns (doc_id, clean_text, n_removed, n_kept) with surviving lines
    rejoined by ``\\n`` in their original order; documents whose every
    line is removed stay in the output with ``clean_text = ''``, and a
    NULL text reads as '' (one blank line) so the document survives too
    — posexplode of split(NULL) would silently drop the doc_id from the
    corpus otherwise.

    Scale (100 TB): the frequency pass shuffles ONLY the trimmed line
    key (map-side partial combine); the heavy-hitter set projects to a
    single column, so AQE broadcasts it when small and falls back to a
    key-partitioned join when a pathological corpus makes it large —
    correctness does not depend on it fitting in memory (unlike
    ``decontaminate``'s deliberate broadcast of the bounded eval-gram
    set). Reassembly is one hash aggregate on doc_id. No Python runs
    anywhere.
    """
    lines = df.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("pos", "line"),
    )
    bad = (
        lines.select(F.trim(F.col("line")).alias("k"))
        .filter(F.col("k") != "")
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("k")
    )
    joined = lines.join(bad, F.trim(lines["line"]) == bad["k"], "left")
    kept_struct = F.when(F.col("k").isNull(), F.struct("pos", "line"))
    return joined.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                # collect_list drops the NULLs the `when` leaves for
                # removed lines; array_sort on (pos, line) structs
                # restores original document order (pos is unique)
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["line"],
            ),
        ).alias("clean_text"),
        F.count("k").cast("long").alias("n_removed"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
    )


def dedup_lines_sql(
    table: str = "documents", text_expr: str = "text", min_count: int = 3
) -> str:
    """DuckDB mirror of ``dedup_lines`` (zipped unnest = posexplode;
    string_agg skips the NULLs the CASE leaves for removed lines, same
    as collect_list; coalesce matches concat_ws's '' on empty)."""
    return f"""
WITH lines AS (
  SELECT doc_id,
         unnest(string_split(coalesce({text_expr}, ''), chr(10))) AS line,
         unnest(range(1, len(string_split(coalesce({text_expr}, ''), chr(10))) + 1)) AS pos
  FROM {table}),
bad AS (
  SELECT trim(line) AS k FROM lines WHERE trim(line) <> ''
  GROUP BY 1 HAVING count(*) >= {min_count})
SELECT doc_id,
       coalesce(string_agg(CASE WHEN b.k IS NULL THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text,
       count(b.k)::BIGINT AS n_removed,
       count(CASE WHEN b.k IS NULL THEN 1 END)::BIGINT AS n_kept
FROM lines LEFT JOIN bad b ON trim(lines.line) = b.k
GROUP BY doc_id
"""


def dedup_lines_by_domain(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Intra-domain boilerplate line removal — the per-site refinement of
    ``dedup_lines`` (RefinedWeb removes repeated lines *within a dump
    partition*, trafilatura-style site chrome is per-host): a line is
    dropped from a document when its trimmed form appears in
    ``min_docs``-or-more DISTINCT documents of the SAME domain.

    Two deliberate semantic differences from the corpus-global pass:

      * counting is per (domain, line) DOCUMENT frequency, not raw
        occurrence count — a line pasted twice inside one page counts
        once, so a single weird page can never trigger removal;
      * a phrase appearing once on each of a thousand DIFFERENT sites is
        content, not chrome — it survives here while ``dedup_lines``
        would delete it from every document.

    Blank lines are structure: never counted, never removed. Documents
    whose every line is removed stay with ``clean_text=''``; NULL text
    reads as '' so the doc survives. Rows with a NULL domain are
    unkeyed: the equality join never matches NULL, so their lines pass
    through untouched (same passthrough stance as ``weburl.domain_cap``
    with ``keep_unkeyed``).

    Returns (doc_id, domain, clean_text, n_removed, n_kept).

    Scale (100 TB): the frequency pass shuffles (domain, trimmed-line,
    doc_id) once with map-side partial distinct, then (domain, line) for
    the final count — both partial-combinable; per-domain chrome makes
    (domain, line) near-unique outside true boilerplate, so no hot keys.
    The offender set projects to two columns and AQE broadcasts it when
    small, falling back to a key-partitioned join otherwise —
    correctness never depends on it fitting in memory. Reassembly is one
    doc-keyed aggregate. No Python anywhere.
    """
    lines = df.select(
        F.col(domain_col).alias("domain"),
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("pos", "line"),
    )
    bad = (
        lines.filter(F.trim(F.col("line")) != "")
        .groupBy("domain", F.trim(F.col("line")).alias("k"))
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select(F.col("domain").alias("bdomain"), "k")
    )
    joined = lines.join(
        bad,
        (lines["domain"] == bad["bdomain"])
        & (F.trim(lines["line"]) == bad["k"]),
        "left",
    )
    kept_struct = F.when(F.col("k").isNull(), F.struct("pos", "line"))
    return joined.groupBy("doc_id", "domain").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["line"],
            ),
        ).alias("clean_text"),
        F.count("k").cast("long").alias("n_removed"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
    )


def dedup_lines_by_domain_sql(
    table: str = "documents",
    domain_expr: str = "domain",
    text_expr: str = "text",
    min_docs: int = 3,
) -> str:
    """DuckDB mirror of ``dedup_lines_by_domain`` (zipped unnest =
    posexplode; count(DISTINCT doc_id) = the within-domain document
    frequency; NULL domains never match the equality join in either
    engine, so unkeyed rows pass through in both)."""
    return f"""
WITH dlines AS (
  SELECT {domain_expr} AS domain, doc_id,
         unnest(string_split(coalesce({text_expr}, ''), chr(10))) AS line,
         unnest(range(1, len(string_split(coalesce({text_expr}, ''), chr(10))) + 1)) AS pos
  FROM {table}),
dbad AS (
  SELECT domain AS bdomain, trim(line) AS k
  FROM dlines WHERE trim(line) <> ''
  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= {min_docs})
SELECT doc_id, domain,
       coalesce(string_agg(CASE WHEN b.k IS NULL THEN line END,
                           chr(10) ORDER BY pos), '') AS clean_text,
       count(b.k)::BIGINT AS n_removed,
       count(CASE WHEN b.k IS NULL THEN 1 END)::BIGINT AS n_kept
FROM dlines LEFT JOIN dbad b
  ON dlines.domain = b.bdomain AND trim(dlines.line) = b.k
GROUP BY doc_id, domain
"""


# ------------------------------------------------- n-gram heavy hitters

def ngram_topk(
    df: DataFrame,
    k: int = 3,
    top: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide boilerplate miner: the ``top`` word k-grams ranked by
    DOCUMENT frequency — the audit query a curation run uses to DISCOVER
    the repeated phrases (cookie banners, nav bars, license footers)
    that ``dedup_lines`` removes and that degenerate MinHash bands
    (reference analog: the repeated-chunk scan its metadata pass applies
    per document, metadata_generator.py — lifted to corpus scope).
    Returns (gram, n_docs) with a total deterministic order: n_docs
    descending, gram ascending (binary UTF-8 in both engines), so the
    top-N boundary never depends on partitioning.

    Scale (100 TB): ``shingles`` is already distinct-per-doc, so the
    explode feeds a partial-combinable HashAggregate on the gram key
    (map-side combine collapses each mapper's duplicates before the only
    shuffle); the global top-N compiles to TakeOrderedAndProject — a
    per-partition bounded heap merged at the driver, never a
    single-partition sort or window. Driver memory is O(top), shuffle
    volume is O(distinct grams), and no Python runs anywhere."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    grams = df.select(F.explode(shingles(F.col(text_col), k)).alias("gram"))
    counts = (
        grams.filter(F.col("gram") != "")
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return counts.orderBy(F.desc("n_docs"), F.asc("gram")).limit(top)


def ngram_topk_sql(
    table: str = "documents",
    text_expr: str = "text",
    k: int = 3,
    top: int = 50,
    min_docs: int = 2,
) -> str:
    """DuckDB mirror of ``ngram_topk`` (same shingle CTE as the MinHash
    verify path; unnest = explode; the ORDER BY total order makes the
    LIMIT boundary engine-independent)."""
    return f"""
WITH {_sh_cte(table, text_expr, k)},
g AS (SELECT unnest(sh) AS gram FROM sh0),
c AS (SELECT gram, count(*)::BIGINT AS n_docs FROM g
      WHERE gram <> '' GROUP BY 1)
SELECT gram, n_docs FROM c WHERE n_docs >= {min_docs}
ORDER BY n_docs DESC, gram LIMIT {top}
"""


# ----------------------------------------------------------- winnowing
#
# Substring-level dedup candidates (Schleimer, Wilkerson & Aiken 2003,
# the MOSS fingerprinting algorithm): where MinHash asks "are these two
# DOCUMENTS near-identical?", winnowing asks "do these two documents
# SHARE A PASSAGE?" — the primitive behind exact-substring dedup of the
# Lee et al. 2022 family, license-text detection, and quote tracing.


def winnow_hashes(col, k: int = 4, w: int = 4):
    """array<long> of distinct winnowing fingerprints of a text column:
    the minimum k-gram hash of every w-wide sliding window over the
    token k-gram hash sequence (the guarantee: any shared token run of
    length >= k + w - 1 contributes at least one IDENTICAL fingerprint
    to both documents). The positional variant records (pos, hash);
    this SET variant keeps just the distinct minima — sufficient for
    candidate generation, and exactly mirrored in SQL.

    Unlike shingle_hashes the k-gram chain here is POSITIONAL (no
    array_distinct before windowing — winnowing's window is over text
    positions); documents shorter than k tokens fall back to one
    whole-text hash, shorter than k+w-1 to the single global minimum.

    Both the k-gram chain AND the sliding window minimum are built by
    zip_with-ing shifted slices — NEVER transform(sequence,
    slice/element_at(i)): non-literal random access inside a lambda is
    the interpreted path (the shingles lesson; measured here 229 s ->
    sub-second for the sf0.1 fingerprint pass when the window min used
    slice(grams, i+1, w) per position). The gram chain itself is the
    shared _positional_gram_hashes (one definition with
    shingle_hashes)."""
    grams = _positional_gram_hashes(col, k)
    g = F.size(grams)
    wchains = [F.slice(grams, j + 1, g - (w - 1)) for j in range(w)]
    mins = wchains[0]
    for nxt in wchains[1:]:
        mins = F.zip_with(mins, nxt, lambda a, b: F.least(a, b))
    return F.array_distinct(
        F.when(g >= w, mins).otherwise(F.array(F.array_min(grams)))
    )


def _winnow_cte(table: str, text_expr: str, k: int, w: int) -> str:
    """CTE prefix computing winnowing fingerprints per doc (wf.fp list) —
    formulas mirror winnow_hashes exactly (shared _gram_chain_sql,
    window minima, distinct). NULL text must stay NULL-faithful: the
    Spark kernel propagates NULL through tokens -> aggregate and emits
    one NULL fingerprint, while DuckDB's list_prepend(0, NULL) would
    fabricate fingerprint 0 (aliasing NULL-text docs with EMPTY-text
    docs) — the explicit th-IS-NULL arm pins [NULL] instead."""
    th = f"list_transform({tokens_sql(text_expr)}, x -> {phash_sql('x')} % {MOD})"
    grams, _ = _gram_chain_sql(k)
    grams = f"CASE WHEN th IS NULL THEN [NULL::BIGINT] ELSE {grams} END"
    return f"""
wth AS (SELECT doc_id, {th} AS th FROM {table}),
wgr AS (SELECT doc_id, {grams} AS grams FROM wth),
wf AS (SELECT doc_id,
              list_distinct(CASE WHEN len(grams) >= {w} THEN
                list_transform(range(1, len(grams) - {w - 2}),
                               i -> list_min(grams[i:i + {w - 1}]))
                ELSE [list_min(grams)] END) AS fp
       FROM wgr)"""


def winnow_fingerprints(
    df: DataFrame, k: int = 4, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Relational winnowing fingerprints: one (doc_id, fp) row per
    distinct fingerprint. Map-only (tokenize → gram chain → window
    minima → explode) — ZERO shuffle; ~2/(w+1) of gram positions
    survive as distinct minima, so output is a bounded fraction of the
    token volume.

    NULL text yields NO fingerprint rows (there is nothing to
    fingerprint) — explicit in BOTH engines: the kernel filters the
    NULL fp the gram chain propagates, the SQL twin WHERE-guards the
    unnest (DuckDB's list_distinct happens to drop NULLs while Spark's
    array_distinct keeps them — neither implicit behavior is relied
    on)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    return df.select(
        "doc_id",
        F.explode(winnow_hashes(F.col(text_col), k=k, w=w)).alias("fp"),
    ).filter(F.col("fp").isNotNull())


def winnow_fingerprints_sql(
    table: str = "documents", text_expr: str = "text", k: int = 4, w: int = 4
) -> str:
    return f"""
WITH {_winnow_cte(table, text_expr, k, w)},
wex AS (SELECT doc_id, unnest(fp) AS fp FROM wf)
SELECT doc_id, fp FROM wex WHERE fp IS NOT NULL
"""


def substring_overlap(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Passage-overlap candidate pairs: documents sharing at least
    ``min_shared`` winnowing fingerprints (each shared fingerprint
    witnesses a shared token run of ~k..k+w-1 tokens; a long shared
    passage yields many). Returns (doc_a, doc_b, n_shared), doc_a <
    doc_b.

    Scale (100 TB): the MinHash band-join discipline applies verbatim —
    the self-join carries ONLY (fp, doc_id); the explicit
    repartition(fp) materializes the fingerprint table as one shuffle
    stage so the join's second side is a ReusedExchange, never a
    recompute of the corpus-sized gram chain; ``max_bucket`` drops
    degenerate fingerprints (boilerplate passages shared by everyone)
    via the same window count that rides the join's own partitioning."""
    fps = winnow_fingerprints(df, k=k, w=w, text_col=text_col)
    if max_bucket is None:
        # uncapped: the explicit repartition materializes the fp table
        # as one shuffle stage so the self-join's second side reuses it
        fps = fps.repartition("fp")
    else:
        # capped: the window count's own hashpartitioning(fp) exchange
        # IS the boundary — adding a repartition would be a dead node
        # (the minhash band-join discipline, _cap_hot_bands)
        cw = Window.partitionBy("fp")
        fps = (
            fps.withColumn("_n", F.count("*").over(cw))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = fps.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = fps.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def substring_overlap_sql(
    table: str = "documents",
    text_expr: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = None,
) -> str:
    cap = ""
    if max_bucket is not None:
        cap = f""",
capped AS (SELECT doc_id, fp FROM (
             SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n
             FROM ex) WHERE n <= {max_bucket})"""
        src = "capped"
    else:
        src = "ex"
    return f"""
WITH {_winnow_cte(table, text_expr, k, w)},
ex AS (SELECT doc_id, unnest(fp) AS fp FROM wf){cap}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM {src} a JOIN {src} b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def minhash_accuracy(
    df: DataFrame, text_col: str = "text", max_bucket: int | None = None,
) -> DataFrame:
    """Sketch-accuracy audit for the MinHash signature: for every
    banded-LSH candidate pair, the signature ESTIMATE of Jaccard
    (matching components / N_HASHES) next to the EXACT shingle-set
    Jaccard, both in integer milli, plus the absolute error — the
    evidence a 100 TB dedup run needs before trusting a 16-component
    sketch to draw its keep/drop boundary (E[estimate] = true Jaccard;
    this measures the realized spread on THIS corpus). Returns
    (id_a, id_b, est_milli, exact_milli, err_milli), id_a < id_b.

    Scale: identical shuffle discipline to minhash_lsh_pairs — the band
    self-join carries only (band_key, doc_id) behind one explicit
    exchange; the deduplicated candidates join back to ONE combined
    (doc_id, sh, signature) relation per side, and both verify joins
    shuffle it by doc_id with identical subplans (exchange reuse pays
    the corpus pass once)."""
    hashed = df.select("doc_id", shingle_hashes(F.col(text_col)).alias("sh"))
    rel = hashed.select(
        "doc_id", "sh",
        *[_mh_i(F.col("sh"), i).alias(f"mh_{i}") for i in range(N_HASHES)],
    )
    bands = _cap_hot_bands(_bands(hashed), max_bucket)
    if max_bucket is None:
        # exchange boundary before the self-join (see minhash_lsh_pairs)
        bands = bands.repartition("band_key")
    a = bands.alias("a")
    b_ = bands.alias("b")
    cand = (
        a.join(b_, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ra = rel.alias("ra")
    rb = rel.alias("rb")
    matches = sum(
        F.when(F.col(f"ra.mh_{i}") == F.col(f"rb.mh_{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    inter = F.size(F.array_intersect("ra.sh", "rb.sh"))
    union = F.size(F.array_union("ra.sh", "rb.sh"))
    return (
        cand.join(ra, F.col("id_a") == F.col("ra.doc_id"))
        .join(rb, F.col("id_b") == F.col("rb.doc_id"))
        .select(
            "id_a", "id_b",
            matches.alias("_m"), inter.alias("_i"), union.alias("_u"),
        )
        .select(
            "id_a", "id_b",
            F.expr(f"_m * 1000 DIV {N_HASHES}").cast("long").alias("est_milli"),
            F.when(F.col("_u") > 0, F.expr("_i * 1000 DIV _u"))
            .cast("long").alias("exact_milli"),
            F.when(
                F.col("_u") > 0,
                F.abs(F.expr(f"_m * 1000 DIV {N_HASHES}") - F.expr("_i * 1000 DIV _u")),
            ).cast("long").alias("err_milli"),
        )
    )


def minhash_accuracy_sql(
    table: str = "documents", text_expr: str = "text",
    max_bucket: int | None = None,
) -> str:
    """DuckDB twin of minhash_accuracy (same shingle/signature/band CTEs
    as the dedup oracles; integer milli arithmetic both sides)."""
    cap_cte, cand_src = "", "bands"
    if max_bucket is not None:
        cap_cte = (
            f"hot AS (SELECT band_key FROM bands "
            f"GROUP BY band_key HAVING count(*) > {max_bucket}),\n"
            "bands_ok AS (SELECT * FROM bands "
            "WHERE band_key NOT IN (SELECT band_key FROM hot)),\n"
        )
        cand_src = "bands_ok"
    m = " + ".join(
        f"(CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(N_HASHES)
    )
    return f"""
WITH {_shh_cte(table, text_expr)},
sig AS (SELECT doc_id, sh, {_mh_cols_sql()} FROM shh),
bands AS ({_band_rows_sql("sig")}),
{cap_cte}cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM {cand_src} a JOIN {cand_src} b
         ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
raw AS (
  SELECT id_a, id_b,
         ({m}) AS m,
         len(list_intersect(sa.sh, sb.sh)) AS i,
         len(list_distinct(list_concat(sa.sh, sb.sh))) AS u
  FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
            JOIN sig sb ON sb.doc_id = cand.id_b)
SELECT id_a, id_b,
       (m * 1000 // {N_HASHES})::BIGINT AS est_milli,
       (CASE WHEN u > 0 THEN i * 1000 // u END)::BIGINT AS exact_milli,
       (CASE WHEN u > 0
             THEN abs(m * 1000 // {N_HASHES} - i * 1000 // u) END)::BIGINT
           AS err_milli
FROM raw
"""


# ------------------------------------- exact shared-substring spans

def exact_substring_spans(
    df: DataFrame,
    min_len: int = 8,
    max_bucket: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Maximal shared token runs of length >= ``min_len`` across
    DISTINCT documents — the exact-substring dedup of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed relationally instead of via their suffix array:
    positional ``min_len``-gram rolling hashes, an equi-join on the
    gram hash carrying only (gh, doc_id, pos), then a gaps-and-islands
    merge along each pair DIAGONAL (pos_a - pos_b): adjacent matching
    grams on one diagonal are one contiguous shared run, so
    ``grp = pos_a - row_number()`` is constant exactly within a run and
    the group aggregate recovers the maximal span. Returns
    (doc_a, doc_b, pos_a, pos_b, match_len) with doc_a < doc_b: the
    run's token offset in each document and its token length.

    Matches are rolling-HASH matches (the standard Rabin-Karp
    relaxation; ~2^-31 collision odds per gram pair against the 31x
    chain mod 2^31-1) — identical formulas in the DuckDB twin keep the
    oracle value-exact either way.

    Scale (100 TB): the join input is pre-filtered to grams occurring
    >= 2 times via a window count whose hashpartitioning(gh) exchange
    doubles as the self-join boundary (the capped substring_overlap /
    _cap_hot_bands discipline — the second join side is a
    ReusedExchange, never a recompute of the corpus-sized gram chain),
    so near-unique grams — the overwhelming majority — never reach the
    join. ``max_bucket`` additionally drops degenerate boilerplate
    grams shared by everyone before they go quadratic. The islands
    window partitions by (doc_a, doc_b, diag) — per-pair-diagonal
    granularity, never a hot funnel."""
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = min_len
    grams = _positional_gram_hashes(F.col(text_col), L)
    n_tok = F.size(tokens(F.col(text_col)))
    pg = df.select(
        "doc_id",
        F.when(n_tok >= L, grams)
        .otherwise(F.array().cast("array<bigint>"))
        .alias("g"),
    )
    ex = pg.select("doc_id", F.posexplode("g").alias("pos", "gh"))
    cw = Window.partitionBy("gh")
    ex = ex.withColumn("_n", F.count("*").over(cw)).filter(F.col("_n") >= 2)
    if max_bucket is not None:
        ex = ex.filter(F.col("_n") <= max_bucket)
    ex = ex.drop("_n")
    a = ex.select(
        F.col("gh"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = ex.select(
        F.col("gh"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    m = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "pos_a",
            "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
    )
    iw = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = m.withColumn("grp", F.col("pos_a") - F.row_number().over(iw))
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pos_a").cast("long").alias("pos_a"),
            F.min("pos_b").cast("long").alias("pos_b"),
            (F.count("*") + F.lit(L - 1)).cast("long").alias("match_len"),
        )
        .select("doc_a", "doc_b", "pos_a", "pos_b", "match_len")
    )


def exact_substring_spans_sql(
    table: str = "documents",
    text_expr: str = "text",
    min_len: int = 8,
    max_bucket: int | None = None,
) -> str:
    """DuckDB twin of exact_substring_spans (shared _gram_chain_sql;
    positions via lockstep multi-unnest of the gram list and
    range(0, len) — 0-based like posexplode). NULL text yields NO gram
    rows in BOTH engines: the kernel's when() falls through to the
    empty array, the twin's explicit th-IS-NOT-NULL arm avoids
    DuckDB's list_prepend(0, NULL) = [0] whole-hash fabrication."""
    L = min_len
    th = f"list_transform({tokens_sql(text_expr)}, x -> {phash_sql('x')} % {MOD})"
    grams, _ = _gram_chain_sql(L)
    cap = f" AND n <= {max_bucket}" if max_bucket is not None else ""
    return f"""
WITH eth AS (SELECT doc_id, {th} AS th FROM {table}),
epg AS (SELECT doc_id,
               CASE WHEN th IS NOT NULL AND len(th) >= {L}
                    THEN {grams} ELSE [] END AS g
        FROM eth),
eex0 AS (SELECT doc_id, unnest(g) AS gh, unnest(range(0, len(g))) AS pos
         FROM epg),
eex AS (SELECT doc_id, gh, pos FROM (
          SELECT *, count(*) OVER (PARTITION BY gh) AS n FROM eex0)
        WHERE n >= 2{cap}),
em AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
       FROM eex a JOIN eex b ON a.gh = b.gh AND a.doc_id < b.doc_id),
eisl AS (SELECT *, pos_a - row_number()
                     OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a)
                   AS grp
         FROM em)
SELECT doc_a, doc_b, min(pos_a)::BIGINT AS pos_a, min(pos_b)::BIGINT AS pos_b,
       (count(*) + {L - 1})::BIGINT AS match_len
FROM eisl GROUP BY doc_a, doc_b, diag, grp
"""


def remove_dup_substrings(
    df: DataFrame,
    min_len: int = 8,
    max_bucket: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """REMOVAL step of Lee et al. 2021 exact-substring dedup — the
    consumer of ``exact_substring_spans``: every shared token run of
    >= ``min_len`` tokens is CUT from each document that holds it
    except the smallest-id holder. Spans emit doc_a < doc_b, so doc_b
    is always the victim; a region shared by k documents is doc_b of a
    pair for every holder but the global minimum, hence exactly ONE
    copy survives corpus-wide (the canonical, in the min-id doc) —
    Lee et al.'s dedup goal made deterministic. A victim's cut
    intervals are merged per doc (gaps-and-islands: a running max of
    interval ends over the start-ordered cuts starts a new island
    whenever a start clears it), so overlapping spans from different
    partners never double-cut.

    The rebuild drops cut token POSITIONS from the CASED token stream
    (textstats.tokens_cased — span positions computed on the folded
    tokens map 1:1 because lowercasing never creates or removes
    whitespace) and re-joins with single spaces: the chunk_documents
    normalization precedent — this output feeds a tokenizer, not a
    renderer. Documents with no cuts keep their text VERBATIM (no
    whitespace normalization for the untouched majority). A fully-cut
    document yields '' (downstream quality gates drop it).

    Returns one row per input row: (id_col, text, n_removed_tokens).

    Scale (100 TB): the span side inherits exact_substring_spans'
    discipline (near-unique grams — the overwhelming majority — are
    filtered before the self-join; the n>=2 window count's exchange
    doubles as the join boundary). Cut intervals carry only
    (doc_id, start, end); the islands window partitions by VICTIM doc
    — per-document granularity, never a hot funnel; the merged
    interval list is collected per doc (bounded by the doc's own token
    count). Document text rides exactly one join (the rebuild, on the
    unskewed doc_id; the interval side holds only victim docs, so AQE
    broadcasts it when small) and the rebuild filter is a map-side
    higher-order function — linear iteration, never the interpreted
    random-access path. The corpus is scanned twice by construction
    (once hashed for spans, once re-emitted) — the same two passes
    Lee et al.'s suffix-array pipeline makes.

    Reference analog: the dedup stage of create_csv.py (SURVEY §2 A7)
    extended to the corpus-prep surface; Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better".
    """
    spans = exact_substring_spans(
        df, min_len=min_len, max_bucket=max_bucket, text_col=text_col
    )
    cuts = spans.select(
        F.col("doc_b").alias(id_col),
        F.col("pos_b").alias("s"),
        (F.col("pos_b") + F.col("match_len")).alias("e"),
    ).distinct()
    ow = Window.partitionBy(id_col).orderBy("s", "e")
    prev = ow.rowsBetween(Window.unboundedPreceding, -1)
    cur = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pm = F.max("e").over(prev)
    isl = cuts.withColumn(
        "_ni",
        F.when(pm.isNull() | (F.col("s") > pm), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("_isl", F.sum("_ni").over(cur))
    merged = isl.groupBy(id_col, "_isl").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    iv = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_cuts")
    )
    toks = tokens_cased(F.col(text_col))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_cuts"), lambda c: (i >= c["s"]) & (i < c["e"])
        ),
    )
    return (
        df.join(iv, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_cuts").isNull(), F.col(text_col))
            .otherwise(F.array_join(kept, " "))
            .alias("text"),
            F.when(F.col("_cuts").isNull(), F.lit(0))
            .otherwise(F.size(toks) - F.size(kept))
            .cast("long")
            .alias("n_removed_tokens"),
        )
    )


def remove_dup_substrings_sql(
    table: str = "documents",
    text_expr: str = "text",
    min_len: int = 8,
    max_bucket: int | None = None,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of remove_dup_substrings (the spans CTE is the
    shared exact_substring_spans_sql verbatim; DuckDB's default window
    frame is RANGE, so both running aggregates pin explicit ROWS
    frames exactly like the kernel's rowsBetween; string_agg ordered
    by the 0-based unnest position mirrors array_join over the
    index-filtered token array)."""
    spans = exact_substring_spans_sql(
        table=table, text_expr=text_expr, min_len=min_len,
        max_bucket=max_bucket,
    )
    toks = tokens_cased_sql(text_expr)
    return f"""
WITH rds_spans AS (SELECT * FROM ({spans}) s),
rds_cuts AS (SELECT DISTINCT doc_b AS {id_col}, pos_b AS s,
                    pos_b + match_len AS e
             FROM rds_spans),
rds_mrk AS (SELECT {id_col}, s, e,
              CASE WHEN s > coalesce(max(e) OVER (
                       PARTITION BY {id_col} ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                   THEN 1 ELSE 0 END AS ni
            FROM rds_cuts),
rds_isl AS (SELECT {id_col}, s, e,
              sum(ni) OVER (PARTITION BY {id_col} ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
            FROM rds_mrk),
rds_mg AS (SELECT {id_col}, min(s) AS s, max(e) AS e
           FROM rds_isl GROUP BY {id_col}, isl),
rds_base AS (SELECT {id_col}, {text_expr} AS text, {toks} AS toks
             FROM {table}),
rds_tok AS (SELECT {id_col}, unnest(toks) AS tok,
                   unnest(range(0, len(toks))) AS pos
            FROM rds_base),
rds_kept AS (SELECT t.{id_col}, t.tok, t.pos
             FROM rds_tok t LEFT JOIN rds_mg g
               ON t.{id_col} = g.{id_col} AND t.pos >= g.s AND t.pos < g.e
             WHERE g.{id_col} IS NULL),
rds_reb AS (SELECT {id_col}, string_agg(tok, ' ' ORDER BY pos) AS new_text,
                   count(*) AS n_kept
            FROM rds_kept GROUP BY {id_col}),
rds_cutdocs AS (SELECT DISTINCT {id_col} FROM rds_mg)
SELECT b.{id_col},
       CASE WHEN c.{id_col} IS NULL THEN b.text
            ELSE coalesce(r.new_text, '') END AS text,
       (CASE WHEN c.{id_col} IS NULL THEN 0
             ELSE len(b.toks) - coalesce(r.n_kept, 0) END)::BIGINT
         AS n_removed_tokens
FROM rds_base b
LEFT JOIN rds_cutdocs c ON b.{id_col} = c.{id_col}
LEFT JOIN rds_reb r ON b.{id_col} = r.{id_col}
"""


def cluster_keepbest(
    labels: DataFrame, quality: DataFrame, score_col: str = "n_chars"
) -> DataFrame:
    """Representative selection for NEAR-DUP clusters: given a
    components labeling (``dedup_components`` output) and a per-doc
    quality score, pick as each cluster's keeper the member with the
    HIGHEST score, ties to the smallest doc_id — real curation runs
    keep the longest / highest-quality member of a near-dup family
    (RefinedWeb, CCNet), not the smallest id that keep-first
    ``is_keeper`` encodes. Scoreless members — a NULL score OR no
    quality row at all (quality is LEFT-joined, so gated scorers that
    only emit rows for passing docs never silently drop cluster
    members) — rank below EVERY scored member, including negative
    scores: the comparison struct leads with a scoreless flag, never a
    magic sentinel a genuine score could tie or undercut. A keeper
    that is itself scoreless reports a NULL best_score.

    Window-free argmax per component (the exact_dedup_keepbest
    discipline): a lexicographic struct-MIN over (scoreless flag,
    negated score, doc_id) is associative and partial-combinable, so
    map-side combine collapses each partition's cluster members before
    the only shuffle; a row_number window would funnel every giant
    boilerplate cluster through one task.

    Scale (100 TB): labels join quality on the unskewed doc_id; the
    joined relation then takes ONE explicit repartition(component) so
    the keeper aggregate and the verdict rejoin share the exchange
    (ReusedExchange — without it the labels+quality lineage executes
    twice, the recompute class the minhash self-join invariant
    documents); the keeper table itself is three short columns —
    document payloads never ride either join.

    Returns (doc_id, component, keeper_id, best_score, is_keeper)."""
    j = labels.select("doc_id", "component").join(
        quality.select(
            "doc_id", F.col(score_col).cast("long").alias("_score")
        ),
        "doc_id",
        "left",
    ).repartition("component")
    nu = F.when(F.col("_score").isNull(), F.lit(1)).otherwise(F.lit(0))
    m = F.min(
        F.struct(
            nu.alias("nu"),
            (-F.coalesce(F.col("_score"), F.lit(0))).alias("ns"),
            F.col("doc_id").alias("id"),
        )
    )
    keepers = (
        j.groupBy("component")
        .agg(m.alias("_m"))
        .select(
            "component",
            F.col("_m.id").alias("keeper_id"),
            F.when(F.col("_m.nu") == 0, -F.col("_m.ns"))
            .cast("long")
            .alias("best_score"),
        )
    )
    return j.join(keepers, "component").select(
        "doc_id",
        "component",
        "keeper_id",
        "best_score",
        (F.col("doc_id") == F.col("keeper_id")).alias("is_keeper"),
    )


def cluster_keepbest_sql(
    pairs_cte: str,
    table: str = "documents",
    score_expr: str = "length(text)",
) -> str:
    """DuckDB mirror of minhash pairs -> dedup_components ->
    cluster_keepbest (``pairs_cte`` must define a CTE named ``pairs``
    with id_a/id_b; ``table`` may be an UNALIASED subquery — the
    closure CTEs and the quality join both alias it themselves;
    ``score_expr`` is evaluated against that table's columns)."""
    return f"""
WITH RECURSIVE {dedup_components_ctes(pairs_cte, table)},
q AS (SELECT a.doc_id, a.component, ({score_expr})::BIGINT AS s
      FROM allc a LEFT JOIN {table} t ON t.doc_id = a.doc_id),
k AS (SELECT component,
             min({{'nu': CASE WHEN s IS NULL THEN 1 ELSE 0 END,
                   'ns': -coalesce(s, 0), 'id': doc_id}}) AS m
      FROM q GROUP BY 1)
SELECT q.doc_id, q.component, m.id AS keeper_id,
       (CASE WHEN m.nu = 0 THEN -m.ns END)::BIGINT AS best_score,
       q.doc_id = m.id AS is_keeper
FROM q JOIN k USING (component)
"""


def dup_gram_profile(
    docs: DataFrame, k: int = 5, min_df: int = 2, text_col: str = "text"
) -> DataFrame:
    """Per-document duplication profile — the memorization-risk audit
    (Lee et al. 2021; Carlini et al. 2022: verbatim memorization scales
    with how often a passage repeats in training data): for every
    document, how many of its distinct word k-grams occur in at least
    ``min_df`` documents corpus-wide, and the milli fraction. The
    corpus-level sibling of ``decontaminate`` (same distinct k-gram
    unit, but the reference set is the corpus itself, df-thresholded)
    and the per-document complement of ``ngram_topk`` (which surfaces
    only the global top). Docs whose every gram is unique score 0;
    boilerplate-heavy docs approach 1000 — the number a curation run
    reads to size dedup_lines/exact_substrings thresholds.

    Scale (100 TB): two gram passes (the unigram_surprisal train/score
    tradeoff). Pass 1: distinct-per-doc gram explode -> document-
    frequency aggregate keyed on the gram (map-side combine; the
    shuffle carries only the gram string). Pass 2: the same explode
    equi-joins the df table ON THE GRAM KEY — a shuffle join, never a
    broadcast: at web scale the gram vocabulary dwarfs executor memory
    (the tfidf_topk discipline; AQE may still pick broadcast when it
    measures small — an optimization, not a dependency) — then one
    per-doc partial-combinable aggregate. Document text never shuffles.

    Returns (doc_id, n_grams, n_dup_grams, milli_dup_frac); NULL and
    zero-token texts contribute NO grams (zero counts, NULL fraction) —
    gated explicitly on token count in BOTH engines, because the bare
    whole-text fallback shingle would otherwise fabricate an '' gram on
    the Spark side (and two empty docs would mark each other
    duplicated) while DuckDB emits no rows."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    ex = _gated_gram_explode(docs, k, text_col)
    df_tab = ex.groupBy("g").agg(F.count("*").cast("long").alias("df"))
    dup = df_tab.filter(F.col("df") >= min_df).select("g", F.lit(1).alias("hit"))
    per_doc = (
        ex.join(dup, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("hit").cast("long").alias("n_dup_grams"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0).cast("long")).alias("n_dup_grams"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("n_dup_grams * 1000 DIV n_grams"),
            ).cast("long").alias("milli_dup_frac"),
        )
    )


def _gated_gram_explode(
    docs: DataFrame, k: int, text_col: str
) -> DataFrame:
    """Distinct-per-doc word k-gram explode, GATED on token count —
    shared by dup_gram_profile and gram_novelty so their gating
    semantics can never drift: the bare whole-text fallback shingle
    would fabricate an '' gram for NULL/zero-token docs on the Spark
    side (while DuckDB emits no rows), letting two empty docs mark
    each other duplicated / steal each other's novelty. Returns
    (doc_id, g)."""
    t = F.col(text_col)
    gated = F.when(
        F.size(tokens(t)) > 0, shingles(t, k)
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(gated).alias("g"))


def _gated_gram_cte(table: str, text_expr: str, k: int) -> str:
    """DuckDB twin of _gated_gram_explode: the shared shingle CTEs plus
    the token-count-gated gram unnest as CTE ``gr`` (doc_id, g)."""
    return f"""{_sh_cte(table, text_expr, k)},
gr AS (SELECT sh0.doc_id, unnest(sh) AS g
       FROM sh0 JOIN tk USING (doc_id) WHERE len(tk.t) > 0)"""


def dup_gram_profile_sql(
    table: str = "documents", text_expr: str = "text",
    k: int = 5, min_df: int = 2,
) -> str:
    """DuckDB twin of dup_gram_profile (shared gated gram CTE;
    distinct per-doc grams make df a plain count; trunc division on
    non-negatives)."""
    return f"""
WITH {_gated_gram_cte(table, text_expr, k)},
dfr AS (SELECT g, count(*)::BIGINT AS df FROM gr GROUP BY g),
dup AS (SELECT g FROM dfr WHERE df >= {min_df}),
per AS (SELECT gr.doc_id, count(*)::BIGINT AS n_grams,
               count(dup.g)::BIGINT AS n_dup_grams
        FROM gr LEFT JOIN dup ON gr.g = dup.g GROUP BY 1)
SELECT d.doc_id,
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       coalesce(p.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       (CASE WHEN p.n_grams > 0
             THEN p.n_dup_grams * 1000 // p.n_grams END)::BIGINT
           AS milli_dup_frac
FROM tk d LEFT JOIN per p ON d.doc_id = p.doc_id
"""


def gram_novelty(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Per-document content novelty in ingestion order — the marginal-
    utility audit of an incremental crawl (each Common Crawl snapshot
    adds progressively less NEW text once dedup runs; this measures
    exactly that, per document): every distinct word k-gram is owned by
    the FIRST document that contains it (min doc_id = ingestion order),
    and a document's novelty is the milli fraction of its distinct
    grams that it owns. The first copy of boilerplate scores high, every
    later copy scores low — unlike ``dup_gram_profile`` (which marks ALL
    copies of a repeated gram), novelty attributes each gram to exactly
    one document, so corpus-wide ``sum(n_novel) == count(distinct
    grams)`` and a curation run can read "ingest N added X% new text"
    directly off the aggregate.

    Scale (100 TB): the dup_gram_profile shape exactly — pass 1 is a
    distinct-per-doc gram explode into a min aggregate keyed on the
    gram (map-side combinable; the shuffle carries only (gram, doc_id));
    pass 2 equi-joins the owner table ON THE GRAM KEY as a shuffle
    join, never a broadcast (the gram vocabulary dwarfs executor
    memory), then one per-doc partial-combinable aggregate. Document
    text never shuffles.

    Returns (doc_id, n_grams, n_novel, milli_novel); NULL and
    zero-token texts contribute no grams (zero counts, NULL fraction),
    gated on token count in BOTH engines (the shared
    _gated_gram_explode)."""
    ex = _gated_gram_explode(docs, k, text_col)
    owners = ex.groupBy("g").agg(F.min("doc_id").alias("first_owner"))
    per_doc = (
        ex.join(owners, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_owner") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
            F.when(
                F.col("n_grams") > 0,
                F.expr("n_novel * 1000 DIV n_grams"),
            ).cast("long").alias("milli_novel"),
        )
    )


def gram_novelty_sql(
    table: str = "documents", text_expr: str = "text", k: int = 5
) -> str:
    """DuckDB twin of gram_novelty (shared gated gram CTE; min() over
    the same doc_id type on both engines, so first-owner attribution
    is identical; trunc division on non-negatives)."""
    return f"""
WITH {_gated_gram_cte(table, text_expr, k)},
own AS (SELECT g, min(doc_id) AS first_owner FROM gr GROUP BY g),
per AS (SELECT gr.doc_id, count(*)::BIGINT AS n_grams,
               sum(CASE WHEN own.first_owner = gr.doc_id
                        THEN 1 ELSE 0 END)::BIGINT AS n_novel
        FROM gr JOIN own USING (g) GROUP BY 1)
SELECT d.doc_id,
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       coalesce(p.n_novel, 0)::BIGINT AS n_novel,
       (CASE WHEN p.n_grams > 0
             THEN p.n_novel * 1000 // p.n_grams END)::BIGINT
           AS milli_novel
FROM tk d LEFT JOIN per p ON d.doc_id = p.doc_id
"""



# --------------------------------------------- Bloom ingest prefilter

# Production default: 2^20 bits. The bit-set RELATION is bounded at m
# rows regardless of history size — sized so a year of daily ingests
# stays under a few MB broadcast. Queries size it DOWN to the fixture
# so every verdict branch is exercised (see queries.bloom_ingest_q).
BLOOM_M = 1 << 20
BLOOM_K = 4


def _bloom_positions(fp, m: int, k: int):
    """k double-hashed bit positions from ONE portable fingerprint:
    ``pos_i = (fp % m + i * (1 + fp % (m-1))) % m`` (Kirsch-Mitzenmacher
    double hashing — two derived hashes simulate k independent ones).
    ``fp`` is a positive 60-bit phash and ``m`` stays far below 2^31,
    so every intermediate fits int64 with room to spare."""
    h1 = fp % m
    h2 = 1 + (fp % (m - 1))
    return F.array(*[((h1 + F.lit(i) * h2) % m).cast("long") for i in range(k)])


def bloom_ingest(
    history: DataFrame,
    batch: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter prefilter for incremental ingest dedup: is each doc
    of a new crawl ``batch`` already in the ``history`` lake? The filter
    answers 'definitely new' exactly (no false negatives — an identical
    fingerprint probes identical positions) and 'maybe seen'
    approximately; only the maybe-seen docs pay the exact fingerprint
    join against history. Returns one row per batch doc:
    ``(id_col, bloom_hit, verdict)`` with verdict in
    {'new', 'dup', 'false_positive'} — the false-positive column IS the
    operator's accuracy audit (measured, not assumed from the formula).

    Fingerprints are ``phash(norm_text(text))`` — the same portable key
    as ``exact_dedup``, so 'dup' here means exactly what keep-first
    dedup would collapse.

    Scale (100 TB): the bit set is ONE distinct aggregate over history
    positions, bounded at ``m`` rows BY CONSTRUCTION no matter how big
    history grows (map-side partial distinct does the heavy lifting);
    it broadcasts to the batch, which is never shuffled for the probe.
    The exact-confirm join ships only (fp, id) pairs and only for the
    bloom-positive subset — the whole point of the prefilter: a daily
    batch joins against a year of history at the cost of its hit rate,
    not the history's size. Incremental maintenance is free:
    ``distinct(positions(h1 ∪ h2)) == distinct(positions(h1)) ∪
    distinct(positions(h2))`` (min/distinct distribute over union, the
    same algebra as minhash_merge), so yesterday's bit set unions with
    today's batch positions without re-reading history — property-
    tested in tests/test_ingest_lake_ops.py.

    Reference analog: the resume-skip membership check of its lineage
    loop (SURVEY.md §2.9) — 'have I already extracted this document?' —
    re-expressed as a set-membership prefilter that never re-reads the
    extracted corpus."""
    fp = phash(norm_text(F.col(text_col)))
    hist_fp = history.select(fp.alias("fp"))
    bits = (
        hist_fp.select(F.explode(_bloom_positions(F.col("fp"), m, k)).alias("pos"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probed = (
        batch.select(F.col(id_col), fp.alias("fp"))
        .select(
            id_col, "fp",
            F.explode(_bloom_positions(F.col("fp"), m, k)).alias("pos"),
        )
        .join(F.broadcast(bits), "pos", "left")
        .groupBy(id_col, "fp")
        .agg((F.min(F.coalesce(F.col("_hit"), F.lit(0))) == 1).alias("bloom_hit"))
    )
    # exact confirm for the bloom-positive subset ONLY; history keys are
    # corpus-sized, so this join must NOT broadcast (key-only shuffle)
    hist_keys = hist_fp.distinct().withColumn("_dup", F.lit(1))
    positive = probed.filter(F.col("bloom_hit")).join(hist_keys, "fp", "left")
    out_pos = positive.select(
        id_col, "bloom_hit",
        F.when(F.col("_dup") == 1, F.lit("dup"))
        .otherwise(F.lit("false_positive")).alias("verdict"),
    )
    out_neg = probed.filter(~F.col("bloom_hit")).select(
        id_col, "bloom_hit", F.lit("new").alias("verdict")
    )
    return out_pos.unionByName(out_neg)


def bloom_ingest_sql(
    history_sql: str,
    batch_sql: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of bloom_ingest (same phash fingerprint, same
    double-hash position chain; fp is positive so % == pmod)."""
    fpx = phash_sql(NORM_SQL.format(e=text_expr))
    pos = f"((fp % {m}) + i * (1 + fp % {m - 1})) % {m}"
    return f"""
WITH hist AS ({history_sql}),
bat AS ({batch_sql}),
hfp AS (SELECT DISTINCT {fpx} AS fp FROM hist),
ii AS (SELECT unnest(range(0, {k})) AS i),
bits AS (SELECT DISTINCT {pos} AS pos FROM hfp, ii),
bfp AS (SELECT {id_col}, {fpx} AS fp FROM bat),
probe AS (
  SELECT {id_col}, fp,
         min(CASE WHEN {pos} IN (SELECT pos FROM bits)
                  THEN 1 ELSE 0 END) AS hit
  FROM bfp, ii GROUP BY 1, 2)
SELECT {id_col}, hit = 1 AS bloom_hit,
       CASE WHEN hit = 0 THEN 'new'
            WHEN fp IN (SELECT fp FROM hfp) THEN 'dup'
            ELSE 'false_positive' END AS verdict
FROM probe
"""
