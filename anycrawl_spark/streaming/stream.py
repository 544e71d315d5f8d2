"""Structured Streaming frontier (SURVEY.md §1.3: "the rounds map naturally
to foreachBatch if we later want a streaming frontier").

The reference has no stream processing (SURVEY.md §2.9) — this module is the
forward-looking surface for continuous ingestion of newly-discovered pages:

- :func:`stream_extract` — a file-source stream over the pages table runs
  the same T1-T20 extraction UDF micro-batch by micro-batch and appends
  results (``foreachBatch`` keeps the batch writer / catalog path shared
  with the batch engine).
- :func:`stream_metrics` — event-time windowed per-host fetch counts with a
  watermark for late WARC timestamps (the streaming analogue of the
  per-round progress table).

Tested with ``trigger(availableNow=True)`` so the whole corpus drains as a
bounded set of micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from anycrawl_spark.corpus import PAGES_SCHEMA
from anycrawl_spark.crawl import _canonical_cols
from anycrawl_spark.udfs import make_extract_udf


def read_pages_stream(spark: SparkSession, corpus_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(corpus_dir)
    )


def stream_extract(spark: SparkSession, corpus_dir: str, out_dir: str,
                   checkpoint_dir: str, available_now: bool = True):
    """Continuously extract newly-landed pages; returns the StreamingQuery."""
    extract = make_extract_udf()
    pages = read_pages_stream(spark, corpus_dir)
    enriched = _canonical_cols(pages, "url")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.repartition(batch_df.sparkSession.sparkContext.defaultParallelism,
                                 "url_hash")
            .withColumn("doc", extract(F.col("url"), F.col("html")))
            .select(
                "url", "url_hash", "host",
                F.col("doc.title").alias("title"),
                F.col("doc.markdown").alias("markdown"),
                F.col("doc.text").alias("text"),
                F.size("doc.links").alias("n_links"),
                F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("append").parquet(out_dir)
        )

    writer = (
        enriched.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(spark: SparkSession, corpus_dir: str,
                   window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed per-host page counts with late-data watermark.
    Returns the streaming DataFrame (caller attaches a sink)."""
    pages = read_pages_stream(spark, corpus_dir)
    enriched = _canonical_cols(pages, "url")
    return (
        enriched.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("pages"),
             F.sum(F.length("html")).alias("bytes"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "host", "pages", "bytes")
    )
