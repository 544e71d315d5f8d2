"""Result memoization: page-cache lookup + upsert semantics
(SURVEY.md §2.1 S8, §2.5 A6, §4 "Result memoization").

Re-expresses ``managers/Cache.ts:24-214`` + ``libs/src/cache/index.ts:153-211``:

- cache key = (urlHash = sha256(canonical url), optionsHash = sha256 of the
  sorted-keys JSON of the cacheable options) — unique index
  ``PostgreSQL.ts:393``;
- lookup = newest-first within max_age (``Cache.ts:50-60``) — a join +
  row_number window;
- save = MERGE-style upsert keyed by (url_hash, options_hash) — expressed as
  "latest snapshot wins" over the union of old cache + new rows, which is
  exactly Iceberg ``MERGE INTO`` at deployment scale.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import DataFrame, Window, functions as F

CACHE_COLS = ["url_hash", "options_hash", "url", "markdown", "text", "title",
              "status", "scraped_at"]

# Reference default TTL tiers (libs/src/config.ts:186-191): a per-call
# max_age always wins; otherwise the tier default applies — 2 days for the
# page cache (ANYCRAWL_CACHE_DEFAULT_MAX_AGE), 7 days for the map/sitemap
# cache (ANYCRAWL_CACHE_SITEMAP_MAX_AGE).
DEFAULT_MAX_AGE_SECONDS = 2 * 24 * 3600
SITEMAP_MAX_AGE_SECONDS = 7 * 24 * 3600
TTL_TIERS = {"page": DEFAULT_MAX_AGE_SECONDS,
             "sitemap": SITEMAP_MAX_AGE_SECONDS}


def ttl_for_tier(tier: str) -> int:
    return TTL_TIERS[tier]


def kv_key_col(job_id: str, url_col) -> "F.Column":
    """crawlee key-value-store key for crawl results:
    ``crawl-data-{jobId}-{base64(url)}`` (Base.ts:561). Our result sink is
    parquet/Iceberg-keyed, but the scalar is part of the reference's
    observable key scheme, so it is provided (and oracle-checked) for
    consumers that address results the reference's way."""
    return F.concat(
        F.lit(f"crawl-data-{job_id}-"),
        F.base64(F.encode(url_col, "utf-8")),
    )


def options_hash(options: dict[str, Any] | None) -> str:
    """sha256 of the recursively key-sorted options JSON
    (``sortKeys`` + ``computeCacheKey``, cache/index.ts:153-211)."""

    def sort_keys(obj):
        if isinstance(obj, dict):
            return {k: sort_keys(obj[k]) for k in sorted(obj)}
        if isinstance(obj, list):
            return [sort_keys(x) for x in obj]
        return obj

    canonical = json.dumps(sort_keys(options or {}), separators=(",", ":"))
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()


def cache_lookup(frontier: DataFrame, cache: DataFrame, opts_hash: str,
                 max_age_seconds: int | None = None,
                 now_expr: str = "current_timestamp()",
                 tier: str | None = "page") -> DataFrame:
    """Left-join the frontier against the cache on (url_hash, options_hash);
    keep only fresh entries, newest first, limit 1 per key (Cache.ts:50-60).
    ``max_age_seconds`` overrides per call; otherwise the ``tier`` default
    TTL applies (page 2d / sitemap 7d, config.ts:186-191); tier=None with no
    max_age disables the age filter entirely.
    Returns frontier columns + ``cache_hit`` flag + cached payload columns.
    ``max_age_seconds=0`` is force-refresh: every row misses (Cache.ts:40-43
    returns null before touching the cache)."""
    if max_age_seconds is None and tier is not None:
        max_age_seconds = ttl_for_tier(tier)
    if max_age_seconds == 0:
        return (  # same column order as the join path below
            frontier
            .withColumn("cached_markdown", F.lit(None).cast("string"))
            .withColumn("cached_text", F.lit(None).cast("string"))
            .withColumn("cached_title", F.lit(None).cast("string"))
            .withColumn("cached_at", F.lit(None).cast("timestamp"))
            .withColumn("cache_hit", F.lit(False))
        )
    fresh = cache.where(F.col("options_hash") == opts_hash)
    if max_age_seconds is not None:
        # strictly greater, matching the reference's gt(scrapedAt, minScrapedAt)
        fresh = fresh.where(
            F.col("scraped_at") > F.expr(f"{now_expr} - INTERVAL {max_age_seconds} SECOND"))
    w = Window.partitionBy("url_hash").orderBy(F.desc("scraped_at"))
    newest = (
        fresh.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("url_hash").alias("__c_hash"),
            F.col("markdown").alias("cached_markdown"),
            F.col("text").alias("cached_text"),
            F.col("title").alias("cached_title"),
            F.col("scraped_at").alias("cached_at"),
        )
    )
    return (
        frontier.join(newest, frontier["url_hash"] == F.col("__c_hash"), "left")
        .withColumn("cache_hit", F.col("__c_hash").isNotNull())
        .drop("__c_hash")
    )


def cache_upsert(cache: DataFrame | None, new_rows: DataFrame) -> DataFrame:
    """MERGE-equivalent: newest row per (url_hash, options_hash) wins across
    old ∪ new; on a scraped_at TIE the new row wins (the reference's
    saveToCache is an unconditional upsert — without the tiebreak a
    re-scrape landing in the same second as the cached entry would
    nondeterministically keep the stale payload). At deployment scale this
    is ``MERGE INTO page_cache USING new ON (url_hash, options_hash)``."""
    new_rows = new_rows.select(*CACHE_COLS).withColumn("__is_new", F.lit(1))
    if cache is None:
        unioned = new_rows
    else:
        unioned = (cache.select(*CACHE_COLS).withColumn("__is_new", F.lit(0))
                   .unionByName(new_rows))
    w = Window.partitionBy("url_hash", "options_hash").orderBy(
        F.desc("scraped_at"), F.desc("__is_new"))
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__is_new")
    )
