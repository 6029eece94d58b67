"""Point-lookup evidence for the indexed sentence layout (VERDICT r4
item 7): the reference indexes full sentence text
(/root/reference/database.py:140,146); the Spark-native equivalent is
storage organization paid at write time. Three layers of proof, all on
the SAME written lake:

1. plan audit — both equalities reach the parquet scan (PushedFilters);
2. layout audit — pyarrow row-group min/max statistics admit the probe
   hash in exactly one row group out of many (the sorted-range layout
   is what makes min/max pruning possible);
3. runtime audit — the Spark scan's numOutputRows metric shows one row
   group read for a present probe, and ZERO rows for an absent probe
   (the bloom filter's exact-absence proof; without it the same probe
   reads the whole lake — measured against a bloom-less twin).
"""

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from pdf_extract_spark import sinks


def _sentences(spark, n=40000):
    # long unique suffix keeps the column chunk above parquet's
    # dictionary-page threshold, so absent-probe pruning below is
    # attributable to the BLOOM filter, not dictionary filtering
    return spark.range(n).select(
        F.concat(
            F.lit("sentence body "),
            F.format_string("%06d", F.col("id")),
            F.lit(" padding so pages are plain-encoded "),
            F.md5(F.col("id").cast("string")),
        ).alias("sentence"),
        F.col("id").alias("original_filename"),
    )


def _scan_rows(df) -> int:
    """numOutputRows of the scan leaf AFTER an action — rows that
    survived parquet row-group pruning (read at all)."""
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().head()
    return leaf.metrics().apply("numOutputRows").value()


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sent")
    path = str(root / "indexed")
    sinks.write_sentences_indexed(_sentences(spark), path, n_files=8)
    return path


def test_lookup_finds_exactly_the_row_and_pushes_both_filters(spark, lake):
    probe = _sentences(spark).filter(
        F.col("original_filename") == 12345
    ).collect()[0]["sentence"]
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try:
        look = sinks.lookup_sentence(spark, lake, probe)
        qe = look._jdf.queryExecution().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "EqualTo(sentence_hash," in qe, qe
    assert "EqualTo(sentence," in qe, qe
    rows = look.collect()
    assert len(rows) == 1 and rows[0]["original_filename"] == 12345


def test_layout_prunes_to_one_row_group_by_hash_stats(spark, lake):
    probe = _sentences(spark).filter(
        F.col("original_filename") == 12345
    ).collect()[0]["sentence"]
    h = spark.range(1).select(
        F.xxhash64(F.lit(probe)).alias("h")
    ).collect()[0]["h"]
    total, containing = 0, 0
    for f in glob.glob(lake + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                if c.path_in_schema == sinks.SENTENCE_HASH_COL:
                    total += 1
                    st = c.statistics
                    if st.min <= h <= st.max:
                        containing += 1
    assert total >= 8  # the layout actually split into many row groups
    assert containing == 1, (containing, total)
    # and the runtime reads only that row group, not the lake
    n = _sentences(spark).count()
    read = _scan_rows(sinks.lookup_sentence(spark, lake, probe))
    assert read <= 2 * (n // 8), (read, n)


def test_bloom_filter_proves_absence_without_reading(spark, lake, tmp_path):
    """An ABSENT sentence lexically inside every row group's string
    min/max range: only the bloom filter can prune it. With the indexed
    layout the scan reads 0 rows; a bloom-less twin of the same data
    reads the whole lake for the identical probe."""
    absent = "sentence body 012345 padding so pages are plain-encoded zz"
    rd = spark.read.parquet(lake)
    read_bloom = _scan_rows(rd.filter(F.col("sentence") == absent))
    assert read_bloom == 0, read_bloom

    twin = str(tmp_path / "noindex")
    (
        _sentences(spark)
        .withColumn(sinks.SENTENCE_HASH_COL, F.xxhash64("sentence"))
        .repartitionByRange(8, sinks.SENTENCE_HASH_COL)
        .sortWithinPartitions(sinks.SENTENCE_HASH_COL)
        .write.mode("overwrite")
        .parquet(twin)
    )
    read_plain = _scan_rows(
        spark.read.parquet(twin).filter(F.col("sentence") == absent)
    )
    assert read_plain == _sentences(spark).count(), read_plain
