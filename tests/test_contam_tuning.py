"""The r5 contamination/tuning wave: eval_contamination (the per-eval-
document report a model card publishes) and lsh_tuning_plan (the
evidence-based (bands, rows) S-curve planner). Value exactness vs
DuckDB is covered every run by the registry mirrors (test_entry +
test_dtype_gate); here live the plan pins and the closed-form
properties the mirrors cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extract_spark.operators import dedup
from pdf_extract_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----------------------------------------------------- eval_contamination

def test_eval_contamination_broadcasts_eval_grams(spark):
    """Same scale discipline as decontaminate, opposite direction: the
    bounded eval gram relation broadcasts; the corpus gram stream is
    never shuffled by gram (no SortMergeJoin anywhere in the plan)."""
    plan = _plan(QUERIES["eval_contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "hashpartitioning(g#" not in plan, plan  # corpus never shuffled by gram


def test_eval_contamination_counts(spark):
    """Hand-built fixture: eval doc e1 shares its whole text with two
    corpus docs, e2 with none. Gram math at k=2 over 'a b c':
    {'a b', 'b c'} — both hit; e2's grams hit nothing."""
    corpus = spark.createDataFrame(
        [(1, "a b c x"), (2, "a b q"), (3, "zz ww")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [(101, "a b c"), (102, "pp qq rr")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.eval_contamination(corpus, ev, k=2).collect()
    }
    e1 = out[101]
    assert e1["n_grams"] == 2  # 'a b', 'b c'
    assert e1["n_hit_grams"] == 2  # 'a b' in docs 1+2, 'b c' in doc 1
    assert e1["n_corpus_docs"] == 2  # docs 1 and 2
    assert e1["is_contaminated"] is True
    e2 = out[102]
    assert e2 == {
        "doc_id": 102, "n_grams": 2, "n_hit_grams": 0, "n_corpus_docs": 0,
        "contam_frac": 0.0, "is_contaminated": False,
    }


# --------------------------------------------------------- lsh_tuning_plan

def test_scurve_monotone_in_bands(spark):
    """For a FIXED signature budget, more bands (shorter rows) can only
    raise detection probability at every Jaccard level — so recall and
    expected candidate volume must be non-decreasing in n_bands, and
    the most permissive split (16 bands x 1 row) must dominate. This is
    the closed-form shape the planner exists to expose; a sign error in
    the multiply chains breaks it immediately."""
    rows = QUERIES["lsh_tuning"](spark, SF).collect()
    assert [r["n_bands"] for r in rows] == [1, 2, 4, 8, 16]
    assert [r["rows_per_band"] for r in rows] == [16, 8, 4, 2, 1]
    n_pairs = {r["n_pairs"] for r in rows}
    assert len(n_pairs) == 1 and n_pairs != {0}  # same histogram, non-empty
    for a, b in zip(rows, rows[1:]):
        assert b["recall_milli"] >= a["recall_milli"], (a, b)
        assert b["exp_cands_milli"] >= a["exp_cands_milli"], (a, b)
        assert b["falsepos_milli"] >= a["falsepos_milli"], (a, b)


def test_scurve_exact_endpoints(spark):
    """Closed-form endpoints: identical docs (jc=100) are detected with
    probability exactly 1 under EVERY config (term = 100^r - 100^r = 0);
    near-disjoint docs sharing no shingle never enter the histogram.
    Two identical + one unrelated doc => one pair at jc=100, recall
    exactly 1000 milli for all five configs."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    rows = dedup.lsh_tuning_plan(docs).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_pairs"] == 1 and r["n_above"] == 1
        assert r["recall_milli"] == 1000
        assert r["exp_cands_milli"] == 1000
        assert r["falsepos_milli"] is None  # no below-threshold pairs


def test_production_config_operating_point(spark):
    """The production default (N_BANDS=4, 4 rows) must appear as a grid
    row and, on the fixture corpus, catch essentially all true
    near-dups while proposing essentially no false candidates — the
    measured justification for the default the dedup family ships."""
    rows = {
        (r["n_bands"], r["rows_per_band"]): r
        for r in QUERIES["lsh_tuning"](spark, SF).collect()
    }
    prod = rows[(dedup.N_BANDS, dedup.N_HASHES // dedup.N_BANDS)]
    assert prod["recall_milli"] >= 990, prod
    assert prod["falsepos_milli"] <= 10, prod


# ------------------------------------------------------------ minhash_merge

def test_minhash_merge_equals_signature_of_shingle_union(spark):
    """The algebra the operator rests on: min distributes over set
    union, so merging member signatures elementwise equals computing
    the signature over the UNION of the members' shingle sets. Checked
    end-to-end: chunk the same logical doc into overlapping members,
    merge their signatures, and compare against the signature computed
    from the explicit shingle-set union."""
    members = spark.createDataFrame(
        [
            (7, 0, "alpha beta gamma delta epsilon"),
            (7, 1, "gamma delta epsilon zeta eta theta"),
            (7, 2, "one two three"),
            (9, 0, "lone member document here"),
        ],
        ["gid", "member", "text"],
    )
    sig = dedup.minhash_signature(
        members.select(F.col("gid").alias("doc_id"), "text")
    ).withColumnRenamed("doc_id", "gid")
    merged = {
        r["gid"]: [r[f"mh_{i}"] for i in range(dedup.N_HASHES)]
        for r in dedup.minhash_merge(sig, key="gid").collect()
    }
    # explicit union of member shingle sets, then the same 2-hash family
    union = (
        members.select(
            "gid", F.explode(dedup.shingle_hashes(F.col("text"))).alias("h")
        )
        .distinct()
        .groupBy("gid")
        .agg(F.collect_list("h").alias("sh"))
        .select(
            "gid",
            *[
                dedup._mh_i(F.col("sh"), i).alias(f"mh_{i}")
                for i in range(dedup.N_HASHES)
            ],
        )
    )
    expected = {
        r["gid"]: [r[f"mh_{i}"] for i in range(dedup.N_HASHES)]
        for r in union.collect()
    }
    assert merged == expected


def test_minhash_merge_single_aggregate_plan(spark):
    """The merge is ONE partial-combinable hash aggregate: map-side
    combine reduces each partition before the only Exchange; no join,
    no window, no Python."""
    plan = _plan(QUERIES["minhash_merge"](spark, SF))
    n_exchange = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_exchange == 1, plan
    assert "partial_min" in plan, plan
    assert "Join" not in plan and "Window" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_scurve_expressions_are_integer_exact():
    """The generated Spark/DuckDB expressions must be literal twins of
    the rational S-curve: compare against Python big-int arithmetic at
    every centi point for every grid config (floats never enter)."""
    for nb, r in dedup.LSH_CONFIG_GRID:
        assert nb * r == dedup.N_HASHES
        for jc in range(0, 101):
            expect = 1000 - (1000 * (100 ** r - jc ** r) ** nb) // (
                100 ** dedup.N_HASHES
            )
            spark_expr = dedup._scurve_milli_spark(r, nb)
            duck_expr = dedup._scurve_milli_duck(r, nb)
            # evaluate the DuckDB twin with Python semantics: strip casts
            py = duck_expr.replace("::HUGEINT", "").replace("//", "//")
            assert eval(py, {"jc": jc}) == expect, (nb, r, jc)
            # the Spark twin differs only in cast syntax
            py2 = (
                spark_expr.replace("CAST(jc AS DECIMAL(38,0))", "jc")
                .replace("CAST(1000 AS DECIMAL(38,0))", "1000")
                .replace(f"CAST({100 ** r} AS DECIMAL(38,0))", str(100 ** r))
                .replace(
                    f"CAST({dedup._SCURVE_DENOM} AS DECIMAL(38,0))",
                    str(dedup._SCURVE_DENOM),
                )
                .replace(" DIV ", " // ")
            )
            assert eval(py2, {"jc": jc}) == expect, (nb, r, jc)
