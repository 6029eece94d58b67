"""Pruning evidence for the z-order layout (sinks.write_zordered /
lookup_zordered — the multi-column half of SURVEY.md §1.4's
"bloom filters / z-order" index mapping; single-key half =
tests/test_sentence_lookup.py). Three layers on the same written lake:

1. plan audit — every probe equality reaches PushedFilters;
2. pruning audit — with a symmetric (a, b) grid, an equality probe on
   EITHER column alone reads a small fraction of the lake (z-order's
   defining property), measured via the scan's numOutputRows;
3. counterfactual — the same data sorted by `a` only: a `b` probe
   reads essentially everything, so the pruning above is attributable
   to the interleave, not to parquet defaults.
"""

import pyspark.sql.functions as F
import pytest

from pdf_extract_spark import sinks

N_SIDE = 256  # symmetric 256 x 256 grid -> 65536 rows


def _grid(spark):
    # payload fattens rows so row_group_bytes=64 KiB yields many row
    # groups per file (pruning granularity for the audit)
    return spark.range(N_SIDE * N_SIDE).select(
        (F.col("id") / N_SIDE).cast("long").alias("a"),
        F.pmod(F.col("id"), F.lit(N_SIDE)).cast("long").alias("b"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


def _scan_rows(df) -> int:
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().head()
    return leaf.metrics().apply("numOutputRows").value()


@pytest.fixture(scope="module")
def lakes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("zorder")
    z, plain = str(root / "z"), str(root / "plain")
    sinks.write_zordered(
        _grid(spark), z, ["a", "b"], n_files=8, bits=8,
        row_group_bytes=64 * 1024,
    )
    # counterfactual: identical data, leading-column sort only
    (
        _grid(spark).repartitionByRange(8, "a")
        .sortWithinPartitions("a", "b")
        .write.mode("overwrite")
        .option("parquet.block.size", str(64 * 1024))
        .parquet(plain)
    )
    return z, plain


def test_probes_push_down_and_return_exact_rows(spark, lakes):
    z, _ = lakes
    look = sinks.lookup_zordered(spark, z, {"a": 123, "b": 45})
    qe = look._jdf.queryExecution().toString()
    assert "EqualTo(a,123)" in qe, qe
    assert "EqualTo(b,45)" in qe, qe
    rows = look.collect()
    assert len(rows) == 1
    assert rows[0]["payload"] is not None


def test_zorder_prunes_on_either_column(spark, lakes):
    z, _ = lakes
    total = _scan_rows(spark.read.parquet(z))
    assert total == N_SIDE * N_SIDE
    a_rows = _scan_rows(sinks.lookup_zordered(spark, z, {"a": 123}))
    b_rows = _scan_rows(sinks.lookup_zordered(spark, z, {"b": 45}))
    # each 256-row stripe admits only the row groups whose z-square
    # crosses it (measured: a-probe ~21%, b-probe ~15% of the lake at
    # 64 KiB row groups); /3 is a loose bound robust to row-group
    # boundary jitter across write parallelism
    assert a_rows < total / 3, (a_rows, total)
    assert b_rows < total / 3, (b_rows, total)


def test_leading_sort_counterfactual_cannot_prune_second_column(spark, lakes):
    z, plain = lakes
    plain_b = _scan_rows(sinks.lookup_zordered(spark, plain, {"b": 45}))
    z_b = _scan_rows(sinks.lookup_zordered(spark, z, {"b": 45}))
    total = N_SIDE * N_SIDE
    # sorted-by-a layout: every row group's b-range spans ~everything
    assert plain_b > total * 0.9, (plain_b, total)
    assert z_b * 4 < plain_b, (z_b, plain_b)


def test_zorder_key_validates_and_clamps(spark):
    with pytest.raises(ValueError):
        sinks.zorder_key([])
    with pytest.raises(ValueError):
        sinks.zorder_key(["a", "b"], bits=32)
    row = (
        spark.range(1)
        .select(
            sinks.zorder_key(
                [F.lit(-5).alias("a"), F.lit(1 << 40).alias("b")], bits=8
            ).alias("k")
        )
        .collect()[0]
    )
    # -5 clamps to 0, 2^40 clamps to 255: interleave of (0, 255) at
    # m=2 puts b's bits on odd positions -> 0b1010...10 = 0xAAAA >> 0
    assert row["k"] == sum(1 << (2 * i + 1) for i in range(8))


def test_zorder_key_is_invertible_on_in_range_values(spark):
    """The interleave is a bijection on [0, 2^bits)^m: decoding the
    Spark-computed key bit-by-bit in pure Python must recover every
    coordinate exactly (seeded random triples, 3 columns x 12 bits —
    the general-m path, not just the m=2 layout the lake tests use)."""
    import random

    rng = random.Random(20260818)
    bits, m = 12, 3
    rows = [
        tuple(rng.randrange(1 << bits) for _ in range(m)) for _ in range(512)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c", sinks.zorder_key(["a", "b", "c"], bits=bits).alias("k")
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        decoded = [0] * m
        for i in range(bits):
            for j in range(m):
                decoded[j] |= ((r["k"] >> (i * m + j)) & 1) << i
        assert decoded == [r["a"], r["b"], r["c"]], (r, decoded)
