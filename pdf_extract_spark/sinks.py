"""Sinks (SURVEY.md §2.1 S10/S12/S13).

The reference writes row-at-a-time SQLite inserts
(/root/reference/main.py:1337-1386), utf-8-sig CSV exports
(euaa_사례/sentences/create_csv.py:41,115,193,309) and a two-sheet Excel
workbook (metadata_generator.py:672-679). Spark-native equivalents:

  * sentences table  -> partitioned parquet append (Iceberg ``append()``
    on a real catalog), one row per span with lineage columns;
  * CSV export       -> ``df.write.csv`` with header; the reference's
    utf-8-sig BOM exists for Excel compatibility — parquet/CSV consumers
    don't need it, but ``bom=True`` writes it for byte parity;
  * two-sheet workbook -> one directory per sheet (sheet == table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def spans_to_sentence_rows(spans_out: DataFrame, run_id: str) -> DataFrame:
    """Explode (doc_id, spans) into the reference's sentence-table shape:
    sentence / source_type / sentence_index / lineage columns
    (database.py:28-55). sentence_index is 1-based per document, exactly
    ``enumerate(sentences, 1)`` (main.py:634)."""
    return spans_out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        F.col("s.text").alias("sentence"),
        F.col("s.kind").alias("source_type"),
        (F.col("s.offset") + 1).alias("sentence_index"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("doc_id").alias("original_filename"),
        F.lit(run_id).alias("batch_id"),
    )


def write_sentences(
    spans_out: DataFrame, path: str, run_id: str, table_format: str = "parquet"
) -> None:
    """S10 — the sentences sink.

    ``table_format="parquet"``: ``path`` is a directory, append parquet.
    ``table_format="iceberg"``: ``path`` is a catalog table name; the
    append is the real Iceberg ``writeTo(tbl).append()`` (snapshot
    commit), creating the table on first write. Same dataframe, only the
    sink verb dispatches (seam tested in tests/test_sources_sinks.py)."""
    rows = spans_to_sentence_rows(spans_out, run_id)
    if table_format == "iceberg":
        if rows.sparkSession.catalog.tableExists(path):
            rows.writeTo(path).append()
        else:
            rows.writeTo(path).create()
    else:
        rows.write.mode("append").parquet(path)


def write_csv(df: DataFrame, path: str, bom: bool = False) -> None:
    """S12 — header CSV export.

    The reference writes ``utf-8-sig`` (BOM) for Excel compatibility
    (create_csv.py:41,115,193,309); Spark's CSV writer emits plain UTF-8.
    With ``bom=True`` the part files are rewritten with the BOM prepended
    after the distributed write — a driver-side pass over the part files,
    fine for exports, wrong for petabyte outputs (leave it off there and
    let the consumer handle encoding). The rewrite reads the output
    directory through the local filesystem, so ``bom=True`` requires a
    driver-local path — a remote scheme (hdfs://, s3a://, ...) raises
    up front instead of failing after the distributed write succeeded."""
    if bom and "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"write_csv(bom=True) requires a driver-local path, got {path!r}; "
            "write without the BOM and prepend it via the target filesystem's API"
        )
    df.write.option("header", True).mode("overwrite").csv(path)
    if bom:
        import os

        if path.startswith("file://"):
            path = path[len("file://"):]
        for name in os.listdir(path):
            if not name.endswith(".csv"):
                continue
            full = os.path.join(path, name)
            with open(full, "rb") as f:
                data = f.read()
            if not data.startswith(b"\xef\xbb\xbf"):
                with open(full, "wb") as f:
                    f.write(b"\xef\xbb\xbf" + data)


def write_two_sheet(text_df: DataFrame, table_df: DataFrame, root: str) -> None:
    """S13 — the two-sheet workbook as two directories (sheet == table):
    Text/ and Table/ (metadata_generator.py:636-639, 672-679)."""
    write_csv(text_df, f"{root}/Text")
    write_csv(table_df, f"{root}/Table")
