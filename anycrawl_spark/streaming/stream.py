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


# ---------------------------------------------------------------------------
# Continuous job intake: the batch analogue of the reference's BullMQ worker
# (Queue.ts / crawl job consumer) — a file-source stream of crawl-job rows
# drives full crawl runs via foreachBatch; each job checkpoints under its
# own directory, so a killed worker resumes exactly like the batch engine.
# ---------------------------------------------------------------------------

JOBS_SCHEMA = ("job_id string, seed_url string, strategy string, "
               "max_depth int, crawl_limit int")


def stream_crawl_jobs(spark: SparkSession, jobs_dir: str, corpus: DataFrame,
                      checkpoint_root: str, stream_checkpoint: str,
                      available_now: bool = True,
                      respect_robots: bool = False):
    """Consume a stream of crawl-job rows; run the crawl engine per job.
    Returns the StreamingQuery. Job rows are tiny — they collect to the
    driver (the reference's worker does the same: one BullMQ job at a time);
    the crawls themselves are distributed Spark jobs."""
    import json
    import os

    from anycrawl_spark.crawl import CrawlConfig, CrawlEngine

    jobs = spark.readStream.schema(JOBS_SCHEMA).json(jobs_dir)

    def run_jobs(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():
            ckpt = os.path.join(checkpoint_root, row["job_id"])
            engine = CrawlEngine(batch_df.sparkSession, corpus, ckpt)
            # batch redelivery after a kill: a job with committed rounds
            # resumes exactly instead of destroying its checkpoint
            resume = engine.catalog.last_round() is not None
            try:
                summary = engine.run(CrawlConfig(
                    job_id=row["job_id"], seed_url=row["seed_url"],
                    strategy=row["strategy"] or "same-domain",
                    # explicit 0 is a legitimate value — only NULL defaults
                    max_depth=(row["max_depth"]
                               if row["max_depth"] is not None else 10),
                    limit=(row["crawl_limit"]
                           if row["crawl_limit"] is not None else 100),
                    respect_robots=respect_robots), resume=resume)
            finally:
                # each engine persists its own prepared-corpus copy; without
                # this a long-running job stream accumulates one cached copy
                # per job on the executors
                engine.corpus.unpersist()
            with open(os.path.join(ckpt, "_summary.json"), "w") as f:
                json.dump(summary, f)

    writer = (jobs.writeStream.foreachBatch(run_jobs)
              .option("checkpointLocation", stream_checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
