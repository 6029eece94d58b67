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

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupStateTimeout

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


# --------------------------------------------------------------------------
# custom stateful operator: streaming chunk assembler
# --------------------------------------------------------------------------

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("n_chunks", T.IntegerType(), False),
        T.StructField("payload", T.StringType(), False),  # JSON span list
    ]
)

_ASSEMBLED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans_json", T.StringType(), False),
    ]
)

_STATE = T.StructType([T.StructField("chunks_json", T.StringType(), True)])


def _assemble_fn(key, pdfs, state):
    """applyInPandasWithState kernel: buffer span-chunks per doc_id across
    micro-batches (arrival order arbitrary); once all n_chunks are
    present, run the FULL deterministic extraction on the reassembled
    document and emit one row, clearing the state.

    State is a single JSON blob {chunk_idx: payload} — tiny (the spans of
    ONE in-flight document), keyed per doc, dropped on completion."""
    from pdf_extract_spark import rules

    (doc_id,) = key
    buffered = json.loads(state.get[0]) if state.exists else {}
    expected = None
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            buffered[str(int(row["chunk_idx"]))] = row["payload"]
            expected = int(row["n_chunks"])
    if expected is not None and len(buffered) >= expected:
        spans = []
        for i in range(expected):
            spans.extend(json.loads(buffered[str(i)]))
        out = rules.extract_document(spans)
        state.remove()
        yield pd.DataFrame([{"doc_id": doc_id, "spans_json": json.dumps(out)}])
    else:
        state.update((json.dumps(buffered),))
        yield pd.DataFrame([], columns=["doc_id", "spans_json"])


def assemble_and_extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Chunked-arrival extraction: documents stream in as out-of-order
    span-chunks (doc_id, chunk_idx, n_chunks, payload); a stateful
    groupBy(doc_id).applyInPandasWithState operator assembles them and
    emits each document's extracted spans exactly once, when complete.
    The stateful analog of the reference's batch_progress accumulation
    (/root/reference/database.py:76-93) as a true streaming operator."""
    chunks = spark.readStream.schema(CHUNK_SCHEMA).parquet(input_dir)
    assembled = chunks.groupBy("doc_id").applyInPandasWithState(
        _assemble_fn,
        outputStructType=_ASSEMBLED,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        assembled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
