"""split_assign_clustered: leakage-proof split assignment (hash the
near-dup cluster label, not the doc id) — zero leakage by construction
where plain split_assign provably leaks, singleton invariance, atomic
cluster placement, and the zero-Exchange map-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup, textstats

# val/test wide enough that a 40-member cluster under plain doc_id
# hashing straddles splits with overwhelming probability
_FR = (("train", 6000), ("val", 2000), ("test", 2000))


def _labels(spark, clusters):
    """clusters: list of member-id lists; component = min member."""
    rows = [(d, min(c)) for c in clusters for d in c]
    return spark.createDataFrame(rows, "doc_id long, component long")


def test_zero_leakage_where_plain_assignment_leaks(spark):
    """A 40-member cluster + 60 singletons: plain split_assign leaks
    (members straddle splits), the clustered assignment never does."""
    big = list(range(0, 40))
    singles = [[i] for i in range(100, 160)]
    labels = _labels(spark, [big] + singles)
    docs = labels.select("doc_id")

    plain = textstats.split_assign(docs, fractions=_FR)
    leak_plain = {
        r["split"]: r["n_leaked"]
        for r in dedup.split_leakage(labels, plain).collect()
    }
    assert sum(leak_plain.values()) > 0  # the defect exists

    fixed = dedup.split_assign_clustered(labels, fractions=_FR)
    leak_fixed = {
        r["split"]: r["n_leaked"]
        for r in dedup.split_leakage(
            labels, fixed.select("doc_id", "split")
        ).collect()
    }
    assert all(v == 0 for v in leak_fixed.values()), leak_fixed


def test_cluster_members_share_one_split(spark):
    labels = _labels(spark, [[3, 7, 9], [12, 15], [20]])
    out = dedup.split_assign_clustered(labels, fractions=_FR).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())


def test_singletons_keep_their_plain_split(spark):
    """component == own doc_id for singletons, so their assignment is
    bit-identical to split_assign keyed on doc_id."""
    singles = [[i] for i in range(200, 260)]
    labels = _labels(spark, singles)
    fixed = {
        r["doc_id"]: (r["split_bucket"], r["split"])
        for r in dedup.split_assign_clustered(labels, fractions=_FR).collect()
    }
    plain = {
        r["doc_id"]: (r["split_bucket"], r["split"])
        for r in textstats.split_assign(
            labels.select("doc_id"), fractions=_FR
        ).collect()
    }
    assert fixed == plain


def test_moved_docs_adopt_their_representative_split(spark):
    """Every non-representative member gets exactly the split the
    representative (min id) would get as a singleton."""
    labels = _labels(spark, [[5, 31, 77], [42, 99]])
    fixed = {
        r["doc_id"]: r["split"]
        for r in dedup.split_assign_clustered(labels, fractions=_FR).collect()
    }
    rep = {
        r["doc_id"]: r["split"]
        for r in textstats.split_assign(
            spark.createDataFrame([(5,), (42,)], "doc_id long"),
            fractions=_FR,
        ).collect()
    }
    assert fixed[31] == fixed[77] == rep[5]
    assert fixed[99] == rep[42]


def test_plan_is_map_only_zero_exchange(spark):
    """The assignment itself adds NO shuffle: a pure projection over the
    labeling (the hash CASE on the component key)."""
    labels = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50).alias("component")
    )
    q = dedup.split_assign_clustered(labels)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
