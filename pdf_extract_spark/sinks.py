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


SENTENCE_HASH_COL = "sentence_hash"


def write_sentences_indexed(
    sentences: DataFrame,
    path: str,
    n_files: int = 32,
    sentence_col: str = "sentence",
    bloom_ndv: int = 1_000_000,
) -> None:
    """Point-lookup-optimized sentence layout — the Spark-native answer
    to the reference's full-sentence-text SQLite indexes
    (/root/reference/database.py:140,146; SURVEY.md §1.4 maps them to
    "partitioning + bloom filters / z-order"). Storage organization is
    paid ONCE at write time so a "find this sentence" probe never
    full-scans:

    * a persisted 64-bit ``xxhash64(sentence)`` key column,
    * files range-partitioned and rows sorted by that key, so a
      hash-equality probe prunes to one row group via parquet min/max
      statistics (the z-order analog for a single key),
    * a parquet BLOOM FILTER on the raw sentence column, so an
      equality probe on the string itself skips row groups whose
      min/max would otherwise admit it (absent-probe scans read ZERO
      rows — measured in tests/test_sentence_lookup.py).

    At 100 TB the probe cost is footer reads + one row group; both
    pruning layers act in the parquet reader before any row reaches
    Spark."""
    keyed = sentences.withColumn(
        SENTENCE_HASH_COL, F.xxhash64(F.col(sentence_col))
    )
    (
        keyed.repartitionByRange(n_files, SENTENCE_HASH_COL)
        .sortWithinPartitions(SENTENCE_HASH_COL)
        .write.mode("overwrite")
        .option(f"parquet.bloom.filter.enabled#{sentence_col}", "true")
        .option(
            f"parquet.bloom.filter.expected.ndv#{sentence_col}",
            str(bloom_ndv),
        )
        .parquet(path)
    )


def lookup_sentence(
    spark, path: str, text: str, sentence_col: str = "sentence"
) -> DataFrame:
    """Exact-sentence point lookup against a ``write_sentences_indexed``
    layout. The probe hash is computed by SPARK itself (one row-local
    job) so it is byte-identical to the persisted key, then pushed as a
    LITERAL equality — ``xxhash64`` of a literal is not constant-folded
    by Catalyst, and a non-literal comparand would not reach
    PushedFilters. Both equalities (hash and raw string) land in the
    parquet scan: the hash hits the sorted min/max layout, the string
    hits the bloom filter."""
    h = (
        spark.range(1)
        .select(F.xxhash64(F.lit(text)).alias("h"))
        .collect()[0]["h"]
    )
    df = spark.read.parquet(path)
    return df.filter(
        (F.col(SENTENCE_HASH_COL) == F.lit(h))
        & (F.col(sentence_col) == F.lit(text))
    )


def zorder_key(cols, bits: int = 16):
    """Morton (z-order) bit-interleave of non-negative integer columns
    into ONE long sort key — the multi-column half of SURVEY.md §1.4's
    "partitioning + bloom filters / z-order" mapping of the reference's
    composite SQLite indexes (/root/reference/database.py:136-175, e.g.
    the (session_id, batch_number) pairs). Sorting by the interleaved
    key gives EVERY participating column spatial locality, so parquet
    row-group min/max statistics prune equality/range probes on ANY
    single column — not just the leading one a plain sort favors.

    Out-of-range values are CLAMPED into [0, 2^bits) rather than
    rejected: a clamped row degrades to the edge bucket (a pruning
    -recall cost only, never a correctness cost — lookups filter on the
    original columns, which are stored verbatim). ``bits * len(cols)``
    must fit a signed long. The key is a pure Catalyst expression
    (shift/and/or) — whole-stage-codegen'd, no UDF, no shuffle of its
    own."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    m = len(cols)
    if bits < 1 or bits * m > 63:
        raise ValueError(f"bits*len(cols) must be in [1, 63], got {bits}*{m}")
    lo, hi = F.lit(0).cast("long"), F.lit((1 << bits) - 1).cast("long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = (F.col(c) if isinstance(c, str) else c).cast("long")
        cl = F.least(F.greatest(cl, lo), hi)
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * m + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
    row_group_bytes: int | None = None,
) -> None:
    """Z-order-clustered parquet layout: range-partition + sort by the
    Morton key of ``cols``, then DROP the key (a projection after the
    sort — order-preserving, no Exchange) so files carry only the
    original columns; their per-row-group min/max statistics are what
    the scan prunes on. ``row_group_bytes`` tightens parquet's block
    size when pruning granularity matters more than scan throughput
    (tests use it; at 100 TB the default 128 MiB row group is right).
    Pruning evidence — either-column probes read a small fraction, the
    leading-sort counterfactual cannot prune its second column — is
    pinned in tests/test_zorder.py."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    writer = (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
    )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)


def lookup_zordered(spark, path: str, probes: dict) -> DataFrame:
    """Point lookup against a ``write_zordered`` layout: a conjunction
    of equality filters on the ORIGINAL columns (any subset of the
    z-order columns — that is the point of the interleave). Every
    equality lands in PushedFilters; row groups whose min/max exclude
    the probe are never read."""
    if not probes:
        raise ValueError("lookup_zordered needs at least one probe")
    df = spark.read.parquet(path)
    cond = None
    for c, v in probes.items():
        eq = F.col(c) == F.lit(v)
        cond = eq if cond is None else (cond & eq)
    return df.filter(cond)


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
                # the in-place rewrite invalidates Spark's Hadoop
                # checksum sidecar — a stale .crc makes the directory
                # unreadable by Spark (ChecksumException), so drop it
                crc = os.path.join(path, f".{name}.crc")
                if os.path.exists(crc):
                    os.remove(crc)


def write_two_sheet(
    text_df: DataFrame, table_df: DataFrame, root: str, bom: bool = False
) -> None:
    """S13 — the two-sheet workbook as two directories (sheet == table):
    Text/ and Table/ (metadata_generator.py:636-639, 672-679)."""
    write_csv(text_df, f"{root}/Text", bom=bom)
    write_csv(table_df, f"{root}/Table", bom=bom)


def write_excel_two_sheet(text_df: DataFrame, table_df: DataFrame, path: str) -> str:
    """S13, native form — ONE .xlsx workbook with Text and Table sheets
    (metadata_generator.py:672-679: ``pd.ExcelWriter`` with two
    ``to_excel`` calls). The xlsx codec (openpyxl) is not installed in
    this container, so the writer sits behind an import-try exactly like
    the media codecs (multimodal.py): with openpyxl present the workbook
    is written driver-side from collected rows (exports are small by
    contract — the reference collects into pandas too); without it the
    CSV two-directory fallback runs. Returns 'xlsx' or 'csv' so callers
    know which artifact they got."""
    try:  # pragma: no cover - openpyxl not present in this container
        from openpyxl import Workbook
    except ImportError:
        # the fallback IS the Excel-compatibility artifact: BOM the CSVs
        # (utf-8-sig, create_csv.py:41) or non-ASCII text opens mojibake'd
        write_two_sheet(
            text_df, table_df, path.removesuffix(".xlsx") + "_csv", bom=True
        )
        return "csv"

    wb = Workbook()  # pragma: no cover - exercised only with the codec
    for sheet_name, df in (("Text", text_df), ("Table", table_df)):
        ws = wb.create_sheet(sheet_name) if wb.sheetnames != ["Sheet"] else wb.active
        ws.title = sheet_name
        ws.append(df.columns)
        for row in df.collect():
            ws.append(list(row))
    wb.save(path)
    return "xlsx"


def read_excel(spark, path: str, sheet: str | None = None) -> DataFrame:
    """S11 — Excel source (metadata_generator.py:636-639: ``pd.read_excel``
    per sheet). Behind the same import-try: with openpyxl the sheet is
    parsed driver-side and parallelized; without the codec a
    ``.xlsx`` path raises with guidance, while the CSV fallback artifact
    written by ``write_excel_two_sheet`` reads distributedly."""
    if path.endswith(".xlsx"):
        try:  # pragma: no cover - openpyxl not present in this container
            from openpyxl import load_workbook
        except ImportError as e:
            raise ImportError(
                "reading .xlsx needs openpyxl; this environment has no xlsx "
                "codec — read the CSV fallback directory (<name>_csv/<Sheet>) "
                "written by write_excel_two_sheet instead"
            ) from e
        wb = load_workbook(path, read_only=True)  # pragma: no cover
        ws = wb[sheet] if sheet else wb.active
        rows = list(ws.values)
        if not rows or all(v is None for v in rows[0]):
            raise ValueError(
                f"sheet {ws.title!r} of {path} is empty (no header row)"
            )
        header, data = list(rows[0]), [list(r) for r in rows[1:]]
        return spark.createDataFrame(data, schema=header)
    # CSV fallback artifact: sheet == subdirectory
    sub = f"{path}/{sheet}" if sheet else path
    return spark.read.option("header", True).csv(sub)
