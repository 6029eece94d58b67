"""component_stats unit semantics (the registered query's composed
minhash -> components -> histogram path is oracle-gated in
test_entry/test_dtype_gate; this pins the histogram arithmetic alone)."""

from __future__ import annotations

from pdf_extract_spark.operators import dedup


def test_component_stats_histogram(spark):
    # components: {a,b,c} (size 3), {d,e} (size 2), {f} and {g} singletons
    labels = spark.createDataFrame(
        [
            ("a", "a"), ("b", "a"), ("c", "a"),
            ("d", "d"), ("e", "d"),
            ("f", "f"), ("g", "g"),
        ],
        "doc_id string, component string",
    )
    out = {r["cluster_size"]: r.asDict() for r in dedup.component_stats(labels).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3 and out[3]["n_removed"] == 2
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2 and out[2]["n_removed"] == 1
    assert out[1]["n_clusters"] == 2 and out[1]["n_docs"] == 2 and out[1]["n_removed"] == 0
    # invariant: sum(n_docs) == corpus size, sum(n_removed) == docs - clusters
    assert sum(r["n_docs"] for r in out.values()) == 7
    assert sum(r["n_removed"] for r in out.values()) == 7 - 4


def test_component_stats_all_singletons(spark):
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "doc_id string, component string"
    )
    rows = dedup.component_stats(labels).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {"cluster_size": 1, "n_clusters": 2, "n_docs": 2, "n_removed": 0}


def _leak(spark, labels, assigned):
    lab = spark.createDataFrame(labels, "doc_id long, component long")
    asg = spark.createDataFrame(assigned, "doc_id long, split string")
    return {
        r["split"]: (r["n_docs"], r["n_dup_docs"], r["n_leaked"],
                     r["leak_milli"])
        for r in dedup.split_leakage(lab, asg).collect()
    }


def test_split_leakage_distinguishes_dup_from_leaked(spark):
    # cluster {1,2} entirely in train: dup but NOT leaked;
    # cluster {3,4} straddles train/val: both members leak;
    # 5 and 6 are singletons: never dup, never leaked.
    labels = [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 6)]
    assigned = [
        (1, "train"), (2, "train"), (3, "train"),
        (4, "val"), (5, "train"), (6, "val"),
    ]
    got = _leak(spark, labels, assigned)
    # train: 4 docs, 3 in >1-clusters, 1 leaked (doc 3), 1*1000 DIV 4
    assert got["train"] == (4, 3, 1, 250)
    # val: 2 docs, doc 4 dup+leaked, doc 6 singleton
    assert got["val"] == (2, 1, 1, 500)


def test_split_leakage_zero_when_clusters_respect_splits(spark):
    labels = [(1, 1), (2, 1), (3, 3), (4, 3)]
    assigned = [(1, "train"), (2, "train"), (3, "val"), (4, "val")]
    got = _leak(spark, labels, assigned)
    assert got["train"] == (2, 2, 0, 0)
    assert got["val"] == (2, 2, 0, 0)


def test_split_leakage_milli_truncates(spark):
    # 1 leaked of 3 docs -> 333 (trunc, not round)
    labels = [(1, 1), (2, 1), (3, 3)]
    assigned = [(1, "train"), (2, "val"), (3, "train")]
    got = _leak(spark, labels, assigned)
    assert got["train"] == (2, 1, 1, 500)
    assert got["val"] == (1, 1, 1, 1000)
    labels = [(1, 1), (2, 1), (3, 3), (4, 4)]
    assigned = [(1, "train"), (2, "val"), (3, "train"), (4, "train")]
    got = _leak(spark, labels, assigned)
    assert got["train"] == (3, 1, 1, 333)


def test_split_leakage_plan_no_window_no_python(spark):
    labels = spark.createDataFrame(
        [(i, i - (i % 2)) for i in range(40)], "doc_id long, component long"
    )
    asg = spark.createDataFrame(
        [(i, "train" if i % 3 else "val") for i in range(40)],
        "doc_id long, split string",
    )
    plan = (dedup.split_leakage(labels, asg)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "Window" not in plan
