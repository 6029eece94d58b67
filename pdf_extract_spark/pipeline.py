"""End-to-end extraction pipeline with explicit scale mechanics.

The north rule (BASELINE.json) mandates three things Catalyst cannot do on
its own (SURVEY.md §4.3):

  1. **skew defense** — documents are distributed by a salted hash of
     ``doc_id`` (``pmod(xxhash64(doc_id), buckets)``) so neighbouring /
     lexicographically clustered doc_ids and giant-PDF hot spots spread
     uniformly across tasks (the reference's analog is its fixed 10-page
     batch split, /root/reference/utils.py:40-106);
  2. **explicit repartitionByRange before the extraction stage** — range
     partitioning on ``(salt, doc_id)`` gives deterministic, balanced,
     re-creatable partitions, which is also what the lineage checkpoint
     keys on;
  3. **checkpoint / resume** — per-partition lineage rows merged into the
     lake's ``lineage`` table; a resumed run anti-joins completed
     partitions (see lineage.py).

The extraction itself is a single map-only Arrow stage (operators/extract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdf_extract_spark.operators.extract import extract_documents

DEFAULT_SALT_BUCKETS = 4096


def salted(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Add the salt column used for partitioning + lineage keying."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(buckets)).cast("int")
    )


def partition_for_extraction(
    df: DataFrame,
    num_partitions: int | None = None,
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Salt + repartitionByRange ahead of the extraction stage."""
    df = salted(df, buckets)
    if num_partitions is not None:
        # explicit None check: a computed 0 must raise (repartitionByRange
        # would), not silently fall into the AQE-coalesced default path
        if num_partitions < 1:
            raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
        return df.repartitionByRange(num_partitions, "salt", "doc_id")
    return df.repartitionByRange("salt", "doc_id")


def run_extraction(
    documents: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """documents(doc_id, spans) -> spans_out(doc_id, spans).

    One shuffle (the mandated range repartition), then one map-only
    Arrow stage; nothing else. At 1000 executors this scales linearly —
    there is no agg/join in the hot path to bottleneck on.
    """
    parted = partition_for_extraction(documents, num_partitions)
    return extract_documents(parted)


def run_extraction_balanced(
    documents: DataFrame,
    num_partitions: int | None = None,
    max_spans: int = 4096,
) -> DataFrame:
    """Skew-defused variant: documents above ``max_spans`` are chunked at
    exact-safe boundaries and composed across tasks, so one 10^5-span
    document cannot pin a task (SURVEY.md §7.4.4). Costs one extra
    explode+regroup shuffle FOR THE GIANTS ONLY; byte-identical output
    (tests/test_skew.py)."""
    from pdf_extract_spark.operators.extract import extract_documents_balanced

    parted = partition_for_extraction(documents, num_partitions)
    return extract_documents_balanced(parted, max_spans)
