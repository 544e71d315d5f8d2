"""Credit/charge rollup (SURVEY §2 A10 stretch; reference
packages/libs/src/credits.ts + packages/scrape/src/managers/Progress.ts).

The reference charges crawl jobs per successful page inside a DB
transaction; the deterministic math is:

- per-page cost (credits.ts ``buildCrawlPageChargeDetails``, :191-204):
  ``crawl_page_success`` = 1, plus ``proxy_stealth`` (default 2, only when
  the resolved proxy mode is stealth), plus ``json_llm_extract`` (env
  ``ANYCRAWL_EXTRACT_JSON_CREDITS``, default 0 — DOUBLED when
  ``extract_source == 'html'``, zero unless 'json' ∈ formats with
  json_options), plus ``summary_generation`` (env default 0, only when
  'summary' ∈ formats). Items with credits <= 0 are dropped
  (``normalizeChargeItem`` :62-79).
- deduction gates (Progress.ts:182-309): charge only successful pages
  (``wasSuccess``), only within the job limit (``done > jobLimit`` →
  skip), and never page 1 (``done <= 1`` — the crawl-initial fee already
  covers it, :225-229).
- idempotency (Progress.ts:283): key ``crawl:page-success:{jobId}:{done}``
  — a replayed/duplicated page event must charge once.

``credit_rollup`` replays a page-event log into per-job credit totals:
two hash aggregations (idempotency dedup keyed by the (job_id, done)
pair, then the per-job rollup); the second shuffle moves one already-
deduped row per page, so the raw-log exchange dominates at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGE_EVENT_SCHEMA = (
    "job_id string, done int, was_success boolean, job_limit int, "
    "proxy string, has_json boolean, extract_source string, "
    "formats array<string>"
)

DEFAULT_STEALTH_CREDITS = 2   # credits.ts:7 DEFAULT_PROXY_STEALTH_CREDITS
DEFAULT_JSON_CREDITS = 0      # credits.ts:8 DEFAULT_EXTRACT_JSON_CREDITS
DEFAULT_SUMMARY_CREDITS = 0   # credits.ts:9 DEFAULT_SUMMARY_CREDITS


def per_page_cost(stealth_credits: int = DEFAULT_STEALTH_CREDITS,
                  json_credits: int = DEFAULT_JSON_CREDITS,
                  summary_credits: int = DEFAULT_SUMMARY_CREDITS):
    """Column expression: crawl per-page charge total for one page event
    (credits.ts buildCrawlPageChargeDetails). The configurable credit
    values mirror the reference's env knobs."""
    base = F.lit(1)                                   # crawl_page_success
    proxy = F.when(F.col("proxy") == "stealth",
                   F.lit(stealth_credits)).otherwise(0)
    json_on = (F.coalesce(F.col("has_json"), F.lit(False))
               & F.array_contains(F.coalesce(
                   F.col("formats"), F.array().cast("array<string>")),
                   "json"))
    json_amount = F.when(
        F.coalesce(F.col("extract_source"), F.lit("markdown")) == "html",
        F.lit(json_credits * 2)).otherwise(F.lit(json_credits))
    jsonc = F.when(json_on & (F.lit(json_credits) > 0),
                   json_amount).otherwise(0)
    summary = F.when(
        F.array_contains(F.coalesce(F.col("formats"),
                                    F.array().cast("array<string>")),
                         "summary") & (F.lit(summary_credits) > 0),
        F.lit(summary_credits)).otherwise(0)
    return base + proxy + jsonc + summary


def credit_rollup(page_events: DataFrame,
                  stealth_credits: int = DEFAULT_STEALTH_CREDITS,
                  json_credits: int = DEFAULT_JSON_CREDITS,
                  summary_credits: int = DEFAULT_SUMMARY_CREDITS) -> DataFrame:
    """Per-job charge rollup from a page-event log: apply the Progress.ts
    deduction gates, dedup by the reference idempotency key, sum the
    per-page costs. Output: (job_id, pages_charged, credits_used,
    pages_seen, pages_skipped)."""
    # coalesce: a NULL was_success (unrecorded outcome) is not a success —
    # without it the NULL poisons `charged` and the skipped count drops rows
    chargeable = F.coalesce(
        F.col("was_success")
        & (F.col("job_limit").isNull() | (F.col("done") <= F.col("job_limit")))
        & (F.col("done") > 1),          # page 1 covered by the initial fee
        F.lit(False),
    )
    cost = per_page_cost(stealth_credits, json_credits, summary_credits)
    # Per-event charge decision BEFORE the idempotency dedup: the dedup
    # aggregation then carries only primitive buffers (bool/long), which
    # keeps it a HashAggregate — min_by over a struct with strings falls
    # back to a per-partition SortAggregate at scale. The idempotency key
    # ``crawl:page-success:{jobId}:{done}`` (Progress.ts:283) is exactly
    # the (job_id, done) pair, so grouping on the pair IS the key dedup;
    # events agree on cost inputs by key in a faithful log, and min/max
    # keep the fold deterministic even when they don't.
    per_event = page_events.select(
        "job_id", "done", chargeable.alias("charged"),
        F.when(chargeable, cost).otherwise(0).cast("long").alias("cost"))
    deduped = (per_event.groupBy("job_id", "done")
               .agg(F.max("charged").alias("charged"),
                    F.max("cost").alias("cost")))
    return (deduped
            .groupBy("job_id")
            .agg(F.sum(F.col("charged").cast("int")).cast("long")
                 .alias("pages_charged"),
                 F.sum("cost").cast("long").alias("credits_used"),
                 F.count("*").cast("long").alias("pages_seen"),
                 F.sum((~F.col("charged")).cast("int")).cast("long")
                 .alias("pages_skipped")))
