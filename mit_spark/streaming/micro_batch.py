"""Structured Streaming wrapper (SURVEY.md §2.8).

The reference is strictly synchronous batch (its only async surface is the
unimplemented translate_async, interface/src/translator/mod.rs:7-11), and
the north rule is checkpointed batch — but because every pipeline stage is
stateless per document, the SAME plan body runs incrementally: a file/
Iceberg stream of docs micro-batches through extract() via foreachBatch,
with Spark's own streaming checkpoint providing exactly-once sink appends.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mit_spark.config import PipelineConfig
from mit_spark.schema import DOCS


def run_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    config: PipelineConfig | None = None,
    *,
    available_now: bool = True,
):
    """Stream docs parquet files from ``input_path`` -> extracted parquet.

    available_now=True drains everything currently present and stops (the
    bounded-stream mode used by tests and backfills); False runs continuous
    micro-batches until stopped.
    """
    from mit_spark.plans.pipeline import extract

    config = config or PipelineConfig()
    stream = spark.readStream.schema(DOCS).parquet(input_path)

    def process_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        extract(batch_df.sparkSession, batch_df, config).write.mode("append").parquet(
            output_path
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
