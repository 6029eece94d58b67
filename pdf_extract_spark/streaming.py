"""Structured Streaming packaging of the incremental extraction
(SURVEY.md §2.9).

The reference's incremental semantics are a batch status machine
(/root/reference/database.py:76-93: resume = select batches with status
NOT IN ('completed'), main.py:996-1017). lineage.py implements that
contract directly; this module offers the alternative packaging the
survey names: ``readStream`` over the documents table with
``trigger(availableNow=True)`` — Spark's checkpoint/offset log plays the
role of the lineage table (exactly-once per input file), and each
invocation drains whatever arrived since the last run, then stops.

This is the idiomatic shape for a continuously-fed 100 TB documents
lake: the SAME extraction DataFrame graph (operators/extract) runs in
both batch and streaming — only the source/sink bindings differ.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from pdf_extract_spark.operators.extract import extract_documents
from pdf_extract_spark.schemas import DOCUMENTS


def incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Drain all unprocessed document files from ``input_dir`` through the
    extraction stage into ``output_dir`` parquet, exactly once.

    Returns the started query; call ``.awaitTermination()`` — with
    availableNow the query stops by itself when caught up.

    Note: streaming file sources don't support repartitionByRange (no
    global sort on an unbounded input); parallelism comes from the file
    source's task-per-file split, and the salt/skew defense applies in
    the batch path. The extraction itself is the same map-only Arrow
    stage, unchanged.
    """
    reader = spark.readStream.schema(DOCUMENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.parquet(input_dir)
    out = extract_documents(docs)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
