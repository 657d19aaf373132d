"""Structured Streaming surface (§2.10 — optional in the batch-round design).

The crawl itself is round-based (exact resume via committed batch snapshots),
but a streaming ingestion surface is provided for continuous page feeds:
``readStream`` over a growing pages directory → the same vectorized
extraction kernel → ``writeStream`` sink, plus a watermarked windowed
aggregation for ingest-rate monitoring.  Incremental file discovery and
checkpointing come from Structured Streaming; the extraction operator is
shared byte-for-byte with the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..data.gen import PAGES_SCHEMA
from ..operators.extraction import extract_pages


def read_pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "structured",
    available_now: bool = True,
):
    """Continuous extraction: new page files → kernel → parquet sink.
    ``available_now`` drains the backlog and stops (test/batch-catchup mode);
    otherwise runs until stopped."""
    pages = read_pages_stream(spark, pages_dir)
    results = extract_pages(pages, mode=mode)
    writer = (
        results.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_rates(
    spark: SparkSession,
    pages_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window ingest rates per language — late pages
    beyond the watermark are dropped (classic late-data handling)."""
    pages = read_pages_stream(spark, pages_dir)
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "pages",
            "bytes",
        )
    )
