"""The HTML path: raw page bytes -> main-content spans -> extracted
spans (the north rule's "HTML boilerplate strip ... DOM heuristics" leg;
structural twin of operators/layout.py's PDF byte path).

Two map-only Arrow stages over the salted/range-partitioned pages:

  1. ``parse_htmls`` — tolerant DOM build + boilerplate strip + span
     emission (sources/htmlparse) per document, batched per Arrow batch;
  2. the shared extraction stage (operators/extract) over the recovered
     input_hint spans — the SAME rule core as the PDF and parquet paths,
     so one golden oracle covers all three input formats.

No shuffle between the stages; the only Exchange is the mandated
repartitionByRange from pipeline.partition_for_extraction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

from pdf_extract_spark.schemas import SPANS

PARSED_HTML = T.StructType(
    [
        T.StructField("spans", SPANS, True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


@pandas_udf(PARSED_HTML)
def parse_html_safe_udf(content: pd.Series) -> pd.DataFrame:
    """Quarantining parse: a payload that is not an HTML document (null,
    undecodable bytes, markup-free) must NOT raise inside the task — at
    web scale one bad row would otherwise fail the whole job through
    task retries. Returns (spans, parse_error); exactly one side is set.

    Same fast-path shape as layout.parse_pdf_safe_udf: clean batches run
    a bare loop with no per-document try/except; when a payload IS bad,
    the quarantine loop resumes AT the failing payload, reusing the
    successfully parsed prefix."""
    from pdf_extract_spark.sources.htmlparse import HtmlError, html_to_spans

    vals = content.tolist()
    spans_out: list = []
    try:
        for b in vals:
            # bytes(None) raises TypeError, routing null payloads to the
            # quarantine loop along with HtmlError payloads
            spans_out.append(html_to_spans(bytes(b)))
        errs: list = [None] * len(vals)
    except (HtmlError, TypeError):
        errs = [None] * len(spans_out)
        for b in vals[len(spans_out):]:
            if b is None:
                spans_out.append(None)
                errs.append("null content")
                continue
            try:
                spans_out.append(html_to_spans(bytes(b)))
                errs.append(None)
            except (HtmlError, TypeError) as e:
                spans_out.append(None)
                errs.append(f"{type(e).__name__}: {e}")
    return pd.DataFrame({"spans": spans_out, "parse_error": errs})


HTML_GATE_SCAN_BYTES = 4096


def html_gate(content_col: str = "content"):
    """The S2-analog validity predicate: non-empty payload whose FIRST
    ``HTML_GATE_SCAN_BYTES`` contain markup. NULL-safe (coalesces to
    false). The scan is bounded (ADVICE r4): casting the whole payload
    to string copies every page twice before the parser ever runs —
    the PDF gate reads 5 bytes, this one reads at most 4 KiB (any real
    HTML shows '<' in its first handful of bytes via doctype/html/head;
    a page whose first tag sits past 4 KiB of tagless prose is
    quarantined as markup-free, the documented gate semantics)."""
    c = F.col(content_col)
    head = F.substring(c, 1, HTML_GATE_SCAN_BYTES).cast("string")
    return F.coalesce(
        c.isNotNull() & (F.length(c) > 0) & (F.instr(head, "<") > 0),
        F.lit(False),
    )


def validate_html(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Keep only rows whose payload is non-empty and contains markup (the
    HTML analog of the PDF %PDF- magic gate, layout.validate_pdfs). Pure
    Catalyst expression — junk rows never reach the Python parser."""
    return df.filter(html_gate(content_col))


def parse_htmls(df: DataFrame, content_col: str = "content") -> DataFrame:
    """pages(doc_id, content:binary) -> (doc_id, spans, parse_error).

    One quarantining Arrow pass: bad payloads surface as ``parse_error``
    rows (spans NULL) instead of failing the task."""
    p = df.select("doc_id", parse_html_safe_udf(F.col(content_col)).alias("p"))
    return p.select(
        "doc_id", F.col("p.spans").alias("spans"),
        F.col("p.parse_error").alias("parse_error"),
    )


def html_to_spans_full(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """The one-pass HTML path with the mandated scale mechanics:
    validate -> salt + repartitionByRange -> quarantining DOM parse +
    boilerplate strip -> shared rule-core extraction. Returns
    (doc_id, spans, parse_error): healthy pages carry EXTRACTED spans,
    bad payloads carry the error string and NULL spans. Persist this
    frame when you consume both sides (the filtered views below re-run
    the parse if executed separately)."""
    from pdf_extract_spark.operators.extract import extract_spans
    from pdf_extract_spark.pipeline import partition_for_extraction

    gate = html_gate()
    valid = df.filter(gate)
    # gate-rejected rows (null/empty/markup-free payloads) join the
    # quarantine LEDGER instead of vanishing: row counts must reconcile
    # against the input (spans rows + error rows == input rows), or a
    # production audit under-reports failures
    rejected = df.filter(~gate).select(
        "doc_id",
        F.lit(None).cast(SPANS).alias("spans"),
        F.lit("failed validation gate: null, empty or markup-free payload")
        .alias("parse_error"),
    )
    parted = partition_for_extraction(valid, num_partitions)
    parsed = parse_htmls(parted)
    # extract_spans maps NULL -> NULL, so quarantined rows pass through
    return parsed.select(
        "doc_id", extract_spans(F.col("spans")).alias("spans"), "parse_error"
    ).unionByName(rejected)


def html_to_spans(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Healthy pages only: (doc_id, spans) fully extracted."""
    full = html_to_spans_full(df, num_partitions)
    return full.filter(F.col("parse_error").isNull()).select("doc_id", "spans")


def html_parse_errors(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """The quarantine view: (doc_id, parse_error) rows."""
    full = html_to_spans_full(df, num_partitions)
    return full.filter(F.col("parse_error").isNotNull()).select("doc_id", "parse_error")


def html_split(
    df: DataFrame, num_partitions: int | None = None, checkpoint: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Both consumers from ONE parse: (healthy(doc_id, spans),
    quarantine(doc_id, parse_error)).

    The natural production pattern — write extracted spans AND the
    quarantine ledger — would pay the expensive Python DOM pass twice if
    it used the two filtered views above (separate actions rebuild the
    plan). Here the parsed frame is localCheckpointed once (the
    dedup_components precedent: materialize the expensive loop-invariant
    input, then fan out), so both sides read executor-local blocks.
    ``checkpoint=False`` returns lazy views for callers that persist or
    write the full frame themselves."""
    full = html_to_spans_full(df, num_partitions)
    if checkpoint:
        full = full.localCheckpoint()
    healthy = full.filter(F.col("parse_error").isNull()).select("doc_id", "spans")
    quarantine = full.filter(F.col("parse_error").isNotNull()).select(
        "doc_id", "parse_error"
    )
    return healthy, quarantine


# --------------------------------------------------------------------------
# link harvest — the corpus-wide web-graph pass (domain caps, blocklists,
# URL dedup all start from this table)
# --------------------------------------------------------------------------

# (?i): HREF=/Href= is well-formed and ubiquitous in legacy crawl HTML;
# a case-sensitive harvest systematically under-counts exactly the old
# domains the caps/blocklists built on this table should police
HREF_PATTERN = r'(?i)href="([^"]+)"'
HREF_PATTERN_SQ = r"(?i)href='([^']+)'"
DOMAIN_PATTERN = r"^https?://([^/]+)"


def harvest_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, url) from quoted href attributes (both quote styles —
    real crawl HTML mixes them). Pure JVM regex (whole-stage codegen, no
    Python): the cheap pass a curation pipeline runs over EVERY page for
    the link graph, where regex recall over well-formed attributes is the
    right cost/recall trade — the DOM path (html_to_spans) remains the
    semantics-complete extractor for unquoted/soup markup."""
    h = F.col(html_col)
    urls = F.concat(
        F.regexp_extract_all(h, F.lit(HREF_PATTERN), F.lit(1)),
        F.regexp_extract_all(h, F.lit(HREF_PATTERN_SQ), F.lit(1)),
    )
    return pages.select("doc_id", F.explode(urls).alias("url"))


# anchor PAIRS: href + the link TEXT it wraps. [^<]* keeps the text group
# plain-text only — an anchor wrapping nested tags (<a..><b>x</b></a>) is
# SKIPPED by both engines identically (the DOM path extracts those); the
# same recall trade harvest_links documents, paid for a pattern that
# stays in the portable Java+RE2 subset (no lazy quantifiers needed).
ANCHOR_PATTERN = r'(?i)<a[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
ANCHOR_PATTERN_SQ = r"(?i)<a[^>]*href='([^']*)'[^>]*>([^<]*)</a>"


def harvest_anchors(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, url, anchor) from plain-text ``<a href=...>text</a>``
    pairs, both quote styles — the link-TEXT harvest behind anchor-term
    aggregation (how the web describes a target). Group-1 and group-2
    extractions of ONE pattern are index-aligned by construction, so
    zip_with pairs them without a second scan. Pure JVM regex, zero
    shuffle, whole-stage codegen."""
    h = F.col(html_col)

    def pairs(pat: str):
        return F.zip_with(
            F.regexp_extract_all(h, F.lit(pat), F.lit(1)),
            F.regexp_extract_all(h, F.lit(pat), F.lit(2)),
            lambda u, t: F.struct(u.alias("url"), t.alias("anchor")),
        )

    both = F.concat(pairs(ANCHOR_PATTERN), pairs(ANCHOR_PATTERN_SQ))
    return pages.select("doc_id", F.explode(both).alias("z")).select(
        "doc_id", F.col("z.url").alias("url"), F.col("z.anchor").alias("anchor")
    )


def url_domain(url_col):
    """Host part of an http(s) URL; '' for other schemes (mailto, #...)."""
    return F.regexp_extract(url_col, DOMAIN_PATTERN, 1)


# robots noindex: pages that ask not to be indexed. Two patterns cover
# both attribute orders (name before content and the reverse) without
# caring about quote style; (?i) covers ROBOTS/NOINDEX casing. Both stay
# in the portable Java+RE2 subset (no lookarounds, no lazy quantifiers)
# so the DuckDB oracle scans the identical regexes.
NOINDEX_PATTERNS = (
    r"(?i)<meta[^>]*robots[^>]*noindex",
    r"(?i)<meta[^>]*noindex[^>]*robots",
)


def noindex_flags(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, noindex) — does the page carry a robots-meta noindex
    directive? A compliant corpus pipeline drops such pages before
    curation (the publisher asked); the flag is returned for EVERY row
    (drop-don't-lose, like quality_filter) so the exclusion is
    auditable. Map-only: two rlike scans inside the projection, zero
    shuffle, no Python."""
    h = F.col(html_col)
    flag = h.rlike(NOINDEX_PATTERNS[0]) | h.rlike(NOINDEX_PATTERNS[1])
    return pages.select("doc_id", flag.alias("noindex"))


def noindex_flags_sql(table: str, html_expr: str = "html") -> str:
    """DuckDB mirror of noindex_flags (same two patterns, OR-ed)."""
    p0, p1 = (p.replace("'", "''") for p in NOINDEX_PATTERNS)
    return f"""
SELECT doc_id,
       (regexp_matches({html_expr}, '{p0}')
        OR regexp_matches({html_expr}, '{p1}')) AS noindex
FROM {table}
"""


# rel=canonical: the page's DECLARED canonical target — how syndicated/
# mirrored copies point at their source. Four patterns cover both
# attribute orders x both quote styles; mixed-quote tags (rel="…"
# href='…') are skipped IDENTICALLY by Java and RE2 — the same bounded
# recall trade harvest_anchors documents, paid to stay in the portable
# regex subset (tag-bounded [^>]*, no lazy quantifiers, no lookaround).
CANONICAL_PATTERNS = (
    r'(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"',
    r'(?i)<link[^>]*href="([^"]*)"[^>]*rel="canonical"',
    r"(?i)<link[^>]*rel='canonical'[^>]*href='([^']*)'",
    r"(?i)<link[^>]*href='([^']*)'[^>]*rel='canonical'",
)


def canonical_targets(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, canonical_url): the page's declared canonical href, NULL
    when the page declares none. Each pattern contributes its FIRST
    match and the patterns coalesce in fixed order, so a page with
    multiple canonical links resolves deterministically. Map-only JVM
    regex — zero shuffle, no Python."""
    h = F.col(html_col)
    first = F.coalesce(
        *[
            F.nullif(F.regexp_extract(h, p, 1), F.lit(""))
            for p in CANONICAL_PATTERNS
        ],
    )
    return pages.select("doc_id", first.alias("canonical_url"))


def canonical_targets_sql(table: str, html_expr: str = "html") -> str:
    """DuckDB mirror of canonical_targets (same patterns, same coalesce
    order; both engines' regexp_extract yields '' on no-match)."""
    exts = ", ".join(
        f"nullif(regexp_extract({html_expr}, '{p.replace(chr(39), chr(39) * 2)}', 1), '')"
        for p in CANONICAL_PATTERNS
    )
    return f"SELECT doc_id, coalesce({exts}) AS canonical_url FROM {table}"
