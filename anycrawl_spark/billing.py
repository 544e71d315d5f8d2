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
                  summary_credits: int = DEFAULT_SUMMARY_CREDITS,
                  stealth_configured: bool = True):
    """Column expression: crawl per-page charge total for one page event
    (credits.ts buildCrawlPageChargeDetails = 1 + the shared option-driven
    parts). Single source of truth with charge_details — both go through
    _scrape_credit_parts, so the rollup and the itemized calculator can
    never disagree on a page's cost."""
    proxy, jsonc, summary = _scrape_credit_parts(
        "", stealth_credits, json_credits, summary_credits,
        stealth_configured)
    return F.lit(1) + proxy + jsonc + summary


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


# --- Itemized charge details (credits.ts CreditCalculator, :60-310) --------

def resolved_proxy_mode_col(proxy_col, stealth_configured: bool = True):
    """proxy.ts getResolvedProxyMode:54-71 — falsy/'base'/'auto' -> base
    ('auto' charges the base rate initially), 'stealth' -> stealth only
    when stealth proxy URLs are configured (a deployment flag here), any
    other value is a custom URL."""
    base_like = (proxy_col.isNull() | (proxy_col == "")
                 | (proxy_col == "base") | (proxy_col == "auto"))
    return (F.when(base_like, F.lit("base"))
            .when(proxy_col == "stealth",
                  F.lit("stealth" if stealth_configured else "base"))
            .otherwise(F.lit("custom")))


def _item(code: str, credits_col):
    return F.struct(F.lit(code).alias("code"),
                    credits_col.cast("long").alias("credits"))


def _scrape_credit_parts(prefix: str, stealth_credits: int,
                         json_credits: int, summary_credits: int,
                         stealth_configured: bool):
    """The three option-driven charge components shared by every
    scrape-shaped calculator, reading columns ``{prefix}proxy``,
    ``{prefix}has_json``, ``{prefix}formats``, ``{prefix}extract_source``."""
    col = lambda n: F.col(prefix + n)  # noqa: E731
    formats = F.coalesce(col("formats"), F.array().cast("array<string>"))
    proxy = F.when(
        resolved_proxy_mode_col(col("proxy"), stealth_configured)
        == "stealth", F.lit(stealth_credits)).otherwise(F.lit(0))
    json_on = (F.coalesce(col("has_json"), F.lit(False))
               & F.array_contains(formats, "json"))
    # JS `options.extract_source || 'markdown'`: NULL or '' -> markdown
    src = col("extract_source")
    source = F.when(src.isNull() | (src == ""), F.lit("markdown")) \
        .otherwise(src)
    jsonc = F.when(
        json_on & (F.lit(json_credits) > 0),
        F.when(source == "html", F.lit(json_credits * 2))
        .otherwise(F.lit(json_credits))).otherwise(F.lit(0))
    summary = F.when(
        F.array_contains(formats, "summary") & (F.lit(summary_credits) > 0),
        F.lit(summary_credits)).otherwise(F.lit(0))
    return proxy, jsonc, summary


_SCRAPE_BASE_CODES = {
    "scrape_v1": ("base_scrape", True),
    "crawl_initial_v1": ("crawl_initial_page", True),
    "crawl_page_v1": ("crawl_page_success", False),  # no template item
}


def charge_details(options: DataFrame, calculator: str,
                   stealth_credits: int = DEFAULT_STEALTH_CREDITS,
                   json_credits: int = DEFAULT_JSON_CREDITS,
                   summary_credits: int = DEFAULT_SUMMARY_CREDITS,
                   stealth_configured: bool = True) -> DataFrame:
    """Itemized billing charge details (credits.ts buildScrapeChargeDetails
    / buildCrawlInitialChargeDetails / buildCrawlPageChargeDetails /
    buildSearchChargeDetails / buildMapChargeDetails): per job-option row,
    the charge items that survive normalizeChargeItem (credits <= 0
    dropped, credits.ts:62-79) plus the job total — entirely JVM-side
    (array build + filter + aggregate; the explode is the only row
    expansion, there is no shuffle).

    ``options`` columns by calculator: always ``job_id`` and
    ``template_credits`` (except crawl_page_v1, which has no template
    item); scrape-shaped ones read (proxy, has_json, formats,
    extract_source); search_v1 additionally (pages,
    completed_scrape_count, has_scrape_options, follow_template_credits)
    with the follow-up scrape options under ``scrape_*`` columns.
    Output: (job_id, calculator, item_code, item_credits, job_total).
    """
    tpl = _item("template_per_call",
                F.coalesce(F.col("template_credits"), F.lit(0)))
    if calculator in _SCRAPE_BASE_CODES:
        base_code, has_tpl = _SCRAPE_BASE_CODES[calculator]
        proxy, jsonc, summary = _scrape_credit_parts(
            "", stealth_credits, json_credits, summary_credits,
            stealth_configured)
        parts = ([tpl] if has_tpl else []) + [
            _item(base_code, F.lit(1)),
            _item("proxy_stealth", proxy),
            _item("json_llm_extract", jsonc),
            _item("summary_generation", summary),
        ]
    elif calculator == "search_v1":
        pages = F.coalesce(F.col("pages"), F.lit(1))        # JS `?? 1`
        n = F.coalesce(F.col("completed_scrape_count"), F.lit(0))
        charge_scrapes = (F.coalesce(F.col("has_scrape_options"),
                                     F.lit(False)) & (n > 0))
        s_proxy, s_json, s_summary = _scrape_credit_parts(
            "scrape_", stealth_credits, json_credits, summary_credits,
            stealth_configured)
        per_scrape = F.lit(1) + s_proxy + s_json + s_summary
        follow = F.coalesce(F.col("follow_template_credits"), F.lit(0))
        parts = [
            tpl,
            _item("search_pages", pages),
            _item("search_result_scrape",
                  F.when(charge_scrapes, n * per_scrape).otherwise(F.lit(0))),
            _item("search_result_scrape_template",
                  F.when(charge_scrapes & (follow > 0), n * follow)
                  .otherwise(F.lit(0))),
        ]
    elif calculator == "map_v1":
        parts = [tpl, _item("base_map", F.lit(1))]
    else:
        raise ValueError(f"unknown calculator {calculator!r}")

    items = F.filter(F.array(*parts), lambda x: x["credits"] > 0)
    total = F.aggregate(items, F.lit(0).cast("long"),
                        lambda acc, x: acc + x["credits"])
    return (options
            .select("job_id", F.lit(calculator).alias("calculator"),
                    total.alias("job_total"),
                    F.explode(items).alias("__i"))
            .select("job_id", "calculator",
                    F.col("__i.code").alias("item_code"),
                    F.col("__i.credits").alias("item_credits"),
                    "job_total"))
