"""Explicit StructType schemas — never schema inference (SURVEY.md §1.3).

Shapes mirror the reference's data model (citations into /root/reference):
  * SPAN / DOCUMENTS: the BASELINE.json ``input_hint`` contract.
  * BLOCK:  PyMuPDF block tuples, euaa_사례/pdf_to_json/layout_analyzer.py:21.
  * LINE:   style-carrying line dicts, layout_analyzer.py:79-100.
  * FRAGMENT: tagged fragments {id,tag,text,size,color},
    euaa_사례/pdf_to_json/main.py:100-106.
  * LINEAGE/METRICS: the SQLite status machine, database.py:59-125.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- spans
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPANS = T.ArrayType(SPAN)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPANS, False),
    ]
)

# Output table has the same shape; kind ∈ {H1,H2,H3,P,table,media} after
# extraction (layout path adds grid-detected 'table' cells).
SPANS_OUT = DOCUMENTS

# ------------------------------------------------------------ layout IR
BBOX = T.StructType(
    [
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
    ]
)

BLOCK = T.StructType(
    [
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("block_type", T.IntegerType(), False),  # 0=text, 1=image
    ]
)

LINE = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("size", T.DoubleType(), False),
        T.StructField("flags", T.IntegerType(), False),  # &16 bold, &2 italic
        T.StructField("font", T.StringType(), True),
        T.StructField("color", T.IntegerType(), False),
        T.StructField("bbox", BBOX, False),
        T.StructField("block_type", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), True),
    ]
)

# one row per page, produced by the byte-stream parse UDF
PARSED_PAGE = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("page_w", T.DoubleType(), False),
        T.StructField("page_h", T.DoubleType(), False),
        T.StructField("lines", T.ArrayType(LINE), False),
    ]
)

PARSED_DOC = T.ArrayType(PARSED_PAGE)

RAW_BLOCKS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("page_w", T.DoubleType(), False),
        T.StructField("page_h", T.DoubleType(), False),
        T.StructField("lines", T.ArrayType(LINE), False),
    ]
)

FRAGMENT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("id", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), False),  # H1/H2/H3/P/media
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("size", T.DoubleType(), True),
        T.StructField("color", T.IntegerType(), True),
    ]
)

# ----------------------------------------------------------- lineage
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # pending/in_progress/completed/failed
        T.StructField("doc_count", T.LongType(), True),
        T.StructField("span_count", T.LongType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("docs_per_sec", T.DoubleType(), True),
        T.StructField("sentences_count", T.LongType(), True),
        T.StructField("processing_time_s", T.DoubleType(), True),
    ]
)

# --------------------------------------------------- alignment fixtures
FRAGMENTS_LANG = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("idx", T.IntegerType(), False),
        T.StructField("id", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("source_type", T.StringType(), False),  # H1/H2/H3/P
    ]
)

ALIGNED_PAIR = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kr_idx", T.IntegerType(), True),
        T.StructField("en_idx", T.IntegerType(), True),
        T.StructField("similarity", T.DoubleType(), True),
        T.StructField("type", T.StringType(), False),
    ]
)
