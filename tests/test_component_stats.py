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
