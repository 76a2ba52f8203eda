"""Explicit StructTypes (the reference's schemas are static Rust structs —
SURVEY.md §1: never inferSchema)."""

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

IN_SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(IN_SPAN), False),
    ]
)

OUT_SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("order", IntegerType(), False),
    ]
)

EXTRACTED = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(OUT_SPAN), False),
    ]
)

# flat exploded span rows as produced by the two branches pre-regroup
FLAT_OUT = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("order", IntegerType(), False),
    ]
)

LINEAGE = StructType(
    [
        StructField("bucket_id", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("n_docs", LongType(), True),
        StructField("n_spans", LongType(), True),
        StructField("n_errors", LongType(), True),
        StructField("started_at", TimestampType(), True),
        StructField("finished_at", TimestampType(), True),
        StructField("error", StringType(), True),
    ]
)
