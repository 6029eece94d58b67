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

from pyspark.sql import DataFrame, functions as F

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
