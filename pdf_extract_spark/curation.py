"""Production curation entry point: the full web-corpus chain over a
real documents table, composed from the individually verified operators.

This is the operational twin of the oracle fixtures in queries.py
(`curate_corpus` / `curate_corpus_full`): those carve their protected
eval slice out of the corpus by doc_id arithmetic so DuckDB can replay
the whole pipeline value-exactly; a real run instead takes the eval set
as an EXPLICIT second table (you decontaminate against the benchmarks
you ship, not a slice of your own crawl) and curates the entire input.
Reference analog: the end-to-end batch loop main.py:996-1017 of
/root/reference — always-on hot-bucket capping mirrors its fixed batch
split (utils.py:40-106).

Stage order (each stage's plan shape is pinned by its own tests):

1. corpus-level line dedup   — nav bars / rights lines removed across
   pages (`dedup.dedup_lines`: line-key-only shuffle);
2. PII scrub                 — map-only staged redaction, BEFORE
   near-dedup so redaction tokens, not raw PII, drive signatures;
3. capped MinHash near-dedup — banded LSH candidates (band join carries
   only ids; hot buckets > max_bucket dropped, auditable via
   `dedup.lsh_band_stats`), pointer-jumping component resolution,
   keep-first keeper per cluster;
4. quality gate              — map-only auditable verdicts;
5. decontamination           — optional, vs the explicit eval table
   (broadcast of the bounded eval-gram set);
6. stratified sampling       — optional per-lang keep rates,
   deterministic salted-hash decision, shuffle-free;
7. sequence packing          — greedy first-fit per hash bucket, ONE
   Exchange + Arrow kernel.

The cleaned corpus (stages 1-2) feeds three downstream consumers
(minhash shingles, the component universe, the keeper/quality chain),
so it is materialized once — on a cluster, write it to a lake table
between stages; in-session, executor-local checkpoint is the
equivalent (measured 15.1 -> 13.0 s on the oracle fixture's twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pdf_extract_spark.operators import dedup, packing, textstats

# Far above any honest near-dup family, catches the nav-bar/cookie-
# banner band collapse that degenerates the band self-join quadratic.
# queries.CURATE_MAX_BUCKET (the oracle fixture's default) aliases this
# constant — one knob, no drift.
DEFAULT_MAX_BUCKET = 256


def clean_corpus(
    docs: DataFrame,
    line_dedup_min_count: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Stages 1-2 of the chain — corpus-level line dedup then PII scrub
    — returning a documents-shaped relation (doc_id, text, lang, source,
    n_chars recomputed over the cleaned text). Shared verbatim by
    `curate_documents` and the oracle fixture
    `queries.curate_corpus_full_q` (twin-drift guard: ONE
    implementation, two callers). The cleaned corpus feeds several
    downstream consumers, so ``materialize`` localCheckpoints it by
    default — on a cluster, write it to a lake table between stages
    instead and pass ``materialize=False``."""
    ld = dedup.dedup_lines(docs, min_count=line_dedup_min_count)
    scrub = textstats.pii_scrub(
        ld.select("doc_id", F.col("clean_text").alias("text"))
    )
    base = (
        docs.select("doc_id", "lang", "source")
        .join(scrub.select("doc_id", F.col("scrubbed").alias("text")), "doc_id")
        .select(
            "doc_id", "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    return base.localCheckpoint(eager=False) if materialize else base


def curate_documents(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    sample_rates: dict[str, float] | None = None,
    min_tokens: int = 25,
    min_stopword_ratio: float = 0.01,
    pack_budget: int = 128,
    line_dedup_min_count: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Run the full curation chain over a documents-shaped DataFrame
    (doc_id castable to long, text, lang, source) and return the packed
    curated corpus: (doc_id, bucket, pack_id, n_tokens, text, lang,
    source), one row per surviving document.

    ``eval_docs`` (doc_id, text) enables benchmark decontamination —
    any document sharing a word-5-gram with it is dropped.
    ``sample_rates`` maps lang -> keep rate; langs absent from the map
    keep everything (rate 1.0). ``materialize=False`` skips the
    localCheckpoints of the cleaned corpus and the survivor set (useful
    when the caller persists them to lake tables between stages
    instead)."""
    base = clean_corpus(
        docs, line_dedup_min_count=line_dedup_min_count,
        materialize=materialize,
    )
    pairs = dedup.minhash_lsh_pairs(base, max_bucket=max_bucket).select(
        "id_a", "id_b"
    )
    comps = dedup.dedup_components(pairs, universe=base)
    keepers = base.join(
        comps.filter(F.col("is_keeper")).select("doc_id"), "doc_id", "semi"
    )
    verdicts = textstats.quality_filter(
        keepers, min_tokens=min_tokens, min_stopword_ratio=min_stopword_ratio
    )
    survivors = keepers.join(
        verdicts.filter(F.col("keep")).select("doc_id"), "doc_id", "semi"
    )
    if eval_docs is not None:
        contaminated = (
            dedup.decontaminate(survivors, eval_docs)
            .filter(F.col("is_contaminated"))
            .select("doc_id")
        )
        survivors = survivors.join(contaminated, "doc_id", "anti")
    if sample_rates:
        survivors = textstats.stratified_sample(
            survivors, sample_rates, default_rate=1.0
        )
    # the survivor set feeds TWO consumers below (the packing walk and
    # the payload join) — without a materialization the keeper semi-join,
    # quality gate and decontaminate gram-explosion re-evaluate once per
    # consumer, the same recompute pathology clean_corpus guards against
    if materialize:
        survivors = survivors.localCheckpoint(eager=False)
    packed = packing.pack_documents(survivors, budget=pack_budget)
    return packed.join(
        survivors.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text", "lang", "source",
        ),
        "doc_id",
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions — the ops tool an
    incremental crawl pipeline runs between ingests: which documents
    were added, removed, changed, or are byte-stable (by content
    fingerprint), keyed by document id.

    Returns one row per key present in EITHER side:
    (key, status in {'added','removed','changed','unchanged'},
    old_fingerprint, new_fingerprint). Presence is tracked by explicit
    flags, not fingerprint NULLness, so a present document with NULL
    text (NULL fingerprint) still diffs correctly; fingerprints compare
    null-safely (two NULL-text versions of a doc are 'unchanged').

    Scale (100 TB): fingerprints are map-side Catalyst expressions
    (textstats.fingerprint_col) computed BEFORE the join, so the full
    outer join carries only (key, fingerprint, flag) per side — never
    document payloads; one shuffle per side on the unskewed key."""
    from pdf_extract_spark.operators.textstats import fingerprint_col

    o = old.select(
        F.col(key_col),
        fingerprint_col(text_col).alias("old_fingerprint"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col),
        fingerprint_col(text_col).alias("new_fingerprint"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, [key_col], "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        key_col,
        status.alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )


def corpus_diff_sql(
    old_table: str,
    new_table: str,
    key_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB mirror of corpus_diff (FULL OUTER JOIN USING coalesces
    the key like Spark's list-form join; IS NOT DISTINCT FROM is the
    eqNullSafe twin)."""
    from pdf_extract_spark.operators.textstats import fingerprint_expr_sql

    fp = fingerprint_expr_sql(text_expr)
    return f"""
WITH o AS (SELECT {key_col}, {fp} AS old_fingerprint, TRUE AS in_old
           FROM {old_table}),
n AS (SELECT {key_col}, {fp} AS new_fingerprint, TRUE AS in_new
      FROM {new_table})
SELECT {key_col},
       CASE WHEN in_old IS NULL THEN 'added'
            WHEN in_new IS NULL THEN 'removed'
            WHEN old_fingerprint IS NOT DISTINCT FROM new_fingerprint
                 THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_fingerprint, new_fingerprint
FROM o FULL OUTER JOIN n USING ({key_col})
"""


# --------------------------------------------- token-distribution drift

def token_drift(
    corpus_a: DataFrame, corpus_b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Unigram distribution drift between two corpus snapshots — the
    dataset-shift monitor a recurring ingest runs next to
    ``corpus_diff`` (which diffs DOCUMENTS; this diffs the TOKEN
    DISTRIBUTION, catching drift that document-level diffing cannot:
    the same pages re-crawled with new boilerplate, a language mix
    shift, a template change). The metric is total-variation distance
    ``TV = 0.5 * sum_t |p_a(t) - p_b(t)|`` in exact integer milli:

        milli_tv = (sum_t |c_a(t)*N_b - c_b(t)*N_a|) * 1000
                   DIV (2 * N_a * N_b)

    — one trunc division of exact integers (decimal(38,0) / HUGEINT
    intermediates carry c*N products exactly to ~1e38, any corpus).
    TV is 0 for identical distributions, 1000 for disjoint vocabularies.

    Returns ONE row: (n_tokens_a, n_tokens_b, vocab_a, vocab_b,
    vocab_shared, milli_tv); milli_tv is NULL when either side has no
    tokens (no distribution to compare).

    Scale (100 TB): two vocab-keyed count aggregates (map-side
    combine; shuffles carry only the token string), ONE full-outer
    join on the token key — vocabulary-sized, so never broadcast —
    and a single partial-combinable global aggregate. The two
    single-row totals fold in by broadcast. Document text never
    shuffles."""
    from pdf_extract_spark.operators.textstats import tokens

    def _counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").cast("long").alias(name))
        )

    ca = _counts(corpus_a, "ca")
    cb = _counts(corpus_b, "cb")
    na = ca.agg(F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("na"))
    nb = cb.agg(F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("nb"))
    joined = (
        ca.join(cb, "tok", "full_outer")
        .select(
            F.coalesce("ca", F.lit(0).cast("long")).alias("ca"),
            F.coalesce("cb", F.lit(0).cast("long")).alias("cb"),
        )
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    agg = joined.agg(
        F.max("na").alias("n_tokens_a"),
        F.max("nb").alias("n_tokens_b"),
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).cast("long").alias("vocab_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).cast("long").alias("vocab_b"),
        F.sum(
            F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0)
        ).cast("long").alias("vocab_shared"),
        F.sum(
            F.abs(
                F.col("ca").cast("decimal(38,0)") * F.col("nb")
                - F.col("cb").cast("decimal(38,0)") * F.col("na")
            )
        ).alias("s"),
    )
    # empty-side edge: when BOTH vocabularies are empty the join emits
    # no rows and every aggregate is NULL -> coalesce the counters to 0;
    # the milli_tv guard reads the PRE-coalesce aggregates (NULL > 0 is
    # NULL -> milli_tv NULL), which is the documented contract for an
    # empty side
    return agg.select(
        F.coalesce("n_tokens_a", F.lit(0).cast("long")).alias("n_tokens_a"),
        F.coalesce("n_tokens_b", F.lit(0).cast("long")).alias("n_tokens_b"),
        F.coalesce("vocab_a", F.lit(0).cast("long")).alias("vocab_a"),
        F.coalesce("vocab_b", F.lit(0).cast("long")).alias("vocab_b"),
        F.coalesce("vocab_shared", F.lit(0).cast("long")).alias("vocab_shared"),
        F.when(
            (F.col("n_tokens_a") > 0) & (F.col("n_tokens_b") > 0),
            F.expr(
                "s * 1000 DIV (CAST(2 AS DECIMAL(38,0))"
                " * n_tokens_a * n_tokens_b)"
            ),
        ).cast("long").alias("milli_tv"),
    )


def token_drift_sql(
    table_a: str, table_b: str, text_expr: str = "text"
) -> str:
    """DuckDB twin of token_drift (same full-outer token join; HUGEINT
    products; ``//`` == DIV on the non-negative sum)."""
    from pdf_extract_spark.operators.textstats import tokens_sql

    toks = tokens_sql(text_expr)
    return f"""
WITH td_ca AS (SELECT tok, count(*)::BIGINT AS ca
               FROM (SELECT unnest({toks}) AS tok FROM {table_a})
               GROUP BY tok),
td_cb AS (SELECT tok, count(*)::BIGINT AS cb
               FROM (SELECT unnest({toks}) AS tok FROM {table_b})
               GROUP BY tok),
td_na AS (SELECT coalesce(sum(ca), 0)::BIGINT AS na FROM td_ca),
td_nb AS (SELECT coalesce(sum(cb), 0)::BIGINT AS nb FROM td_cb),
td_j AS (SELECT coalesce(a.ca, 0)::BIGINT AS ca,
                coalesce(b.cb, 0)::BIGINT AS cb
         FROM td_ca a FULL OUTER JOIN td_cb b USING (tok)),
td_agg AS (SELECT
    (SELECT na FROM td_na) AS n_tokens_a,
    (SELECT nb FROM td_nb) AS n_tokens_b,
    sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_a,
    sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_b,
    sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_shared,
    sum(abs(ca::HUGEINT * (SELECT nb FROM td_nb)
            - cb::HUGEINT * (SELECT na FROM td_na))) AS s
    FROM td_j)
SELECT coalesce(n_tokens_a, 0)::BIGINT AS n_tokens_a,
       coalesce(n_tokens_b, 0)::BIGINT AS n_tokens_b,
       coalesce(vocab_a, 0)::BIGINT AS vocab_a,
       coalesce(vocab_b, 0)::BIGINT AS vocab_b,
       coalesce(vocab_shared, 0)::BIGINT AS vocab_shared,
       (CASE WHEN n_tokens_a > 0 AND n_tokens_b > 0
             THEN s * 1000 // (2::HUGEINT * n_tokens_a * n_tokens_b)
        END)::BIGINT AS milli_tv
FROM td_agg
"""


# --------------------------------------------- DSIR importance weights

def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by how much more likely its hashed word-bigram features
    are under the TARGET distribution (a sample of the domain you want
    more of) than under the raw corpus itself — the published recipe
    for selecting pretraining data that resembles a quality target.

    Integer-exact re-expression: per-bucket
    ``bits = flog2(c_target + 1) - flog2(c_raw + 1)`` (exact bit-length
    logs over add-one-smoothed bucket counts). This is the paper's
    ``log p_t(b) - log p_r(b)`` up to the two corpus-size normalizers,
    which are GLOBAL constants: per-gram-averaged they shift every
    document identically, so ranking — the thing resampling consumes —
    is unchanged. Returns (doc_id, n_grams, total_bits,
    milli_bits_per_gram); docs with no grams (NULL text) keep
    n_grams = total_bits = 0 with a NULL average. The milli average is
    computed sign-split (``-((-t) * 1000 DIV n)`` for negative totals)
    so both engines truncate toward zero identically — Spark's DIV and
    DuckDB's ``//`` only agree on non-negative operands.

    Scale (100 TB): the hashed feature space is the point of the paper
    — both count tables aggregate to <= n_buckets rows regardless of
    corpus size (map-side combine; the shuffle carries only
    (bucket, partial count)), so the bits table is bounded by
    construction and BROADCASTS to the score pass: corpus text never
    shuffles by bucket, and the per-doc sum is partial-combinable. Two
    tokenize passes (count + score) — the standard train/score
    tradeoff, unigram_surprisal's discipline."""
    from pdf_extract_spark.operators.dedup import _positional_gram_hashes
    from pdf_extract_spark.operators.textstats import _flog2

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    def _buckets(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(
                _positional_gram_hashes(F.col(text_col), 2)
            ).alias("gh"),
        ).select("doc_id", (F.col("gh") % n_buckets).alias("b"))

    raw = _buckets(corpus).groupBy("b").agg(
        F.count("*").cast("long").alias("cr")
    )
    tgt = _buckets(target).groupBy("b").agg(
        F.count("*").cast("long").alias("ct")
    )
    # every scored bucket exists in raw (same corpus), so raw LEFT tgt
    # covers the score pass; absent target buckets smooth to c+1 = 1
    bits = raw.join(tgt, "b", "left").select(
        "b",
        (
            _flog2(F.coalesce(F.col("ct"), F.lit(0).cast("long")) + F.lit(1))
            - _flog2(F.col("cr") + F.lit(1))
        ).cast("long").alias("bits"),
    )
    scored = (
        _buckets(corpus)
        .join(F.broadcast(bits), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("total_bits", F.lit(0).cast("long")).alias("total_bits"),
            F.when(
                F.col("n_grams") > 0,
                F.when(
                    F.col("total_bits") >= 0,
                    F.expr("total_bits * 1000 DIV n_grams"),
                ).otherwise(-F.expr("(-total_bits) * 1000 DIV n_grams")),
            ).cast("long").alias("milli_bits_per_gram"),
        )
    )


def dsir_weights_sql(
    corpus_table: str,
    target_table: str,
    text_expr: str = "text",
    n_buckets: int = 4096,
) -> str:
    """DuckDB twin of dsir_weights (shared _gram_chain_sql bigrams;
    flog2 = length(bin(n)) - 1; the same sign-split milli division).
    NULL text yields NO gram rows in BOTH engines — the explicit
    th-IS-NULL arm avoids DuckDB's list_prepend(0, NULL) = [0]
    whole-hash fabrication."""
    from pdf_extract_spark.operators.dedup import MOD, _gram_chain_sql
    from pdf_extract_spark.operators.hashing import phash_sql
    from pdf_extract_spark.operators.textstats import tokens_sql

    th = f"list_transform({tokens_sql(text_expr)}, x -> {phash_sql('x')} % {MOD})"
    grams, _ = _gram_chain_sql(2)
    g = f"CASE WHEN th IS NULL THEN NULL ELSE {grams} END"
    B = n_buckets
    return f"""
WITH dth_c AS (SELECT doc_id, {th} AS th FROM {corpus_table}),
dg_c AS (SELECT doc_id, {g} AS g FROM dth_c),
dex_c AS (SELECT doc_id, unnest(g) % {B} AS b FROM dg_c),
dth_t AS (SELECT doc_id, {th} AS th FROM {target_table}),
dg_t AS (SELECT doc_id, {g} AS g FROM dth_t),
dex_t AS (SELECT doc_id, unnest(g) % {B} AS b FROM dg_t),
craw AS (SELECT b, count(*)::BIGINT AS cr FROM dex_c GROUP BY b),
ctgt AS (SELECT b, count(*)::BIGINT AS ct FROM dex_t GROUP BY b),
bits AS (SELECT craw.b,
                ((length(bin(coalesce(ct, 0) + 1)) - 1)
                 - (length(bin(cr + 1)) - 1))::BIGINT AS bits
         FROM craw LEFT JOIN ctgt ON craw.b = ctgt.b),
sc AS (SELECT doc_id, count(*)::BIGINT AS n_grams,
              sum(bits)::BIGINT AS total_bits
       FROM dex_c JOIN bits USING (b) GROUP BY doc_id)
SELECT c.doc_id,
       coalesce(sc.n_grams, 0)::BIGINT AS n_grams,
       coalesce(sc.total_bits, 0)::BIGINT AS total_bits,
       (CASE WHEN sc.n_grams > 0 THEN
          CASE WHEN sc.total_bits >= 0
               THEN (sc.total_bits * 1000) // sc.n_grams
               ELSE -(((-sc.total_bits) * 1000) // sc.n_grams) END
        END)::BIGINT AS milli_bits_per_gram
FROM {corpus_table} c LEFT JOIN sc ON c.doc_id = sc.doc_id
"""


# --------------------------------------------- compaction planning


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planning — the planning half of Iceberg's
    ``rewrite_data_files`` binpack: within each table partition, walk
    data files in file-id order and assign each to output bin
    ``floor(preceding-cumulative-size / target_bytes)`` — a new bin
    starts exactly when the running total crosses the target, so every
    bin except possibly the last holds >= target bytes and < target +
    one file. Deterministic (file order, not arrival order), pure
    integer math, engine-portable. Returns every input row plus
    ``bin``; the executing job then rewrites each (partition, bin)
    group as one file.

    Scale (100 TB): the input is the FILE MANIFEST — one metadata row
    per data file, never the data — so even a million-file table is a
    million rows. The window is partitioned by the table partition (the
    unit a compaction commit rewrites), NEVER a global sort: plans for
    different partitions build and execute independently, which is
    exactly how the rewrite parallelizes on a cluster.

    Reference analog: the fixed-size batch splitter it runs before
    extraction (utils.py:40-106, SURVEY.md S4) — the same
    'group small units up to a byte budget' rule, applied to the lake's
    physical layout instead of the input corpus."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return (
        files.select(
            part_col, file_col,
            F.col(size_col).cast("long").alias(size_col),
            prev.alias("_prev"),
        )
        .select(
            part_col, file_col, size_col,
            F.expr(f"_prev DIV {target_bytes}").cast("long").alias("bin"),
        )
    )


def compaction_plan_sql(
    files_sql: str,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> str:
    """DuckDB twin of compaction_plan (window sum cast ::BIGINT — DuckDB
    returns HUGEINT/DECIMAL otherwise; // is trunc division on the
    non-negative cumulative sum, == Spark DIV)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    return f"""
SELECT {part_col}, {file_col}, {size_col},
       (coalesce(sum({size_col}) OVER (
            PARTITION BY {part_col} ORDER BY {file_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        // {target_bytes})::BIGINT AS bin
FROM ({files_sql})
"""
