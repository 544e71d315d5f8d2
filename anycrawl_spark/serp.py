"""SERP structured extraction (SURVEY.md §2.4 G1-G6).

Google result-page parsing re-expressed on Spark: a vectorized pandas UDF
parses fixture SERP HTML into result structs
(``/root/reference/packages/search/src/engines/Google.ts:201-257``), then
plain DataFrame ops implement the page planner and the search→scrape merge
(``SearchService.ts:206-314``, ``SearchController.ts:346-381``).

The parser registry is pluggable like the reference's engine registry
(constants.ts:44: google / searxng / ac-engine); searxng/ac-engine are JSON
passthroughs expressed with ``from_json``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

SERP_RESULT_STRUCT = ArrayType(StructType([
    StructField("title", StringType()),
    StructField("url", StringType()),
    StructField("description", StringType()),
    StructField("source", StringType()),
    StructField("category", StringType()),
]))


def parse_google_serp(html: str) -> list[dict]:
    """Pure-Python Google SERP parser (Google.ts:201-257): for each
    ``div[jscontroller="SC7lYd"]`` block take ``a h3`` text as title, the
    anchor's href as url, ``div[data-sncf="1"]`` text (scripts removed) as
    description; skip the block if any of the three is missing."""
    from anycrawl_spark.kernel.dom import parse_html, select, select_one

    root = parse_html(html or "")
    results = []
    for block in select(root, 'div[jscontroller="SC7lYd"]'):
        h3 = select_one(block, "a h3")
        if h3 is None:
            continue
        title = h3.text_content.strip()
        anchor = h3.parent
        url = (anchor.attrs.get("href") or "") if anchor is not None else ""
        if not url:
            continue
        # ALL matching nodes, text concatenated — cheerio's $nodes.text()
        # (Google.ts:222-224); taking only the first node drops snippet
        # continuation/date lines
        content_nodes = select(block, 'div[data-sncf="1"]')
        if not content_nodes:
            continue
        for node in content_nodes:
            for script in select(node, "script"):
                script.detach()
        description = "".join(n.text_content for n in content_nodes).strip()
        if not description:
            continue
        results.append({
            "title": title,
            "url": url,
            "description": description,
            "source": "Google Search Result",
            "category": "web",
        })
    return results


@F.pandas_udf(SERP_RESULT_STRUCT)
def google_parse_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: [
            (r["title"], r["url"], r["description"], r["source"], r["category"])
            for r in parse_google_serp(h)
        ]
    )


PARSERS = {"google": google_parse_udf}


# ---------------------------------------------------------------------------
# G3: SearXNG JSON response parser (Searxng.ts:97-180)
# ---------------------------------------------------------------------------

# JSON schema of one SearXNG result item (extra fields in the payload are
# ignored by from_json, mirroring the reference's untyped JSON access)
SEARXNG_ITEM_DDL = (
    "url string, title string, content string, snippet string, "
    "engine string, category string, resolution string, img_src string, "
    "positions array<int>, thumbnail_src string, img_format string, "
    "filesize string, publishedDate string, pubdate string, thumbnail string"
)
SEARXNG_RESPONSE_DDL = f"struct<results: array<struct<{SEARXNG_ITEM_DDL}>>>"


def parse_searxng_response(responses: DataFrame, body_col: str = "body") -> DataFrame:
    """SearXNG JSON → flat result rows (Searxng.ts:97-180), pure JVM plan:
    ``from_json`` + ``posexplode`` + per-category column expressions.

    Reference semantics reproduced exactly:
    - items without ``url`` are skipped (suggestions etc., Searxng.ts:113);
    - ``category`` defaults to ``web``; anything not images/news maps to web;
    - description = ``content || snippet || ""`` (falsy-chain → coalesce of
      non-null, non-empty);
    - source = ``SearXNG (<engine|unknown>)``;
    - images: resolution ``(\\d+)\\s*[×x]\\s*(\\d+)`` → width/height,
      imageUrl = img_src, position = positions[0];
    - news: snippet = description chain, date = publishedDate || pubdate,
      imageUrl = thumbnail.

    ``position`` is the index within the parsed results list (skips excluded),
    assigned per (query, page) — a keyed window, shuffle-safe at scale.
    """
    parsed = responses.withColumn(
        "__resp", F.from_json(F.col(body_col), SEARXNG_RESPONSE_DDL))
    items = (
        parsed.select(
            "query", "page",
            F.posexplode_outer("__resp.results").alias("__pos", "r"))
        .where(F.col("r.url").isNotNull() & (F.col("r.url") != ""))
    )
    nonempty = lambda c: F.when(F.col(c) != "", F.col(c))  # noqa: E731
    category = F.coalesce(nonempty("r.category"), F.lit("web"))
    category = (
        F.when(category == "images", "images")
        .when(category == "news", "news")
        .otherwise("web")
    )
    description = F.coalesce(nonempty("r.content"), nonempty("r.snippet"), F.lit(""))
    source = F.concat(
        F.lit("SearXNG ("), F.coalesce(nonempty("r.engine"), F.lit("unknown")),
        F.lit(")"))
    res_w = F.regexp_extract(F.col("r.resolution"), r"(\d+)\s*[×x]\s*(\d+)", 1)
    res_h = F.regexp_extract(F.col("r.resolution"), r"(\d+)\s*[×x]\s*(\d+)", 2)
    is_img = category == "images"
    is_news = category == "news"
    w = Window.partitionBy("query", "page").orderBy("__pos")
    return items.select(
        "query", "page",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
        category.alias("category"),
        F.coalesce(F.col("r.title"), F.lit("")).alias("title"),
        F.col("r.url").alias("url"),
        description.alias("description"),
        source.alias("source"),
        F.when(is_img, F.col("r.img_src"))
         .when(is_news, F.col("r.thumbnail")).alias("image_url"),
        F.when(is_img & (res_w != ""), res_w.cast("long")).alias("image_width"),
        F.when(is_img & (res_h != ""), res_h.cast("long")).alias("image_height"),
        F.when(is_img, F.col("r.positions").getItem(0).cast("long"))
         .alias("image_position"),
        F.when(is_news,
               F.coalesce(nonempty("r.publishedDate"), nonempty("r.pubdate")))
         .alias("news_date"),
    )


# ---------------------------------------------------------------------------
# G4: AC-engine JSON response parser (ACEngine.ts:61-115)
# ---------------------------------------------------------------------------

AC_ITEM_DDL = (
    "url string, title string, description string, snippet string, "
    "source string, category string, imageUrl string, imageWidth bigint, "
    "imageHeight bigint, position bigint, thumbnail_src string, "
    "img_format string, filesize string, date string"
)
AC_RESPONSE_DDL = f"struct<results: array<struct<{AC_ITEM_DDL}>>>"


def parse_ac_response(responses: DataFrame, body_col: str = "body") -> DataFrame:
    """AC-engine JSON → flat result rows (ACEngine.ts:61-115): pure
    passthrough — description = ``description || snippet || ""``, source
    defaults to ``AC-Engine``, images keep their typed width/height/position,
    news keep snippet/date/imageUrl. Same skip-no-url rule as SearXNG."""
    parsed = responses.withColumn(
        "__resp", F.from_json(F.col(body_col), AC_RESPONSE_DDL))
    items = (
        parsed.select(
            "query", "page",
            F.posexplode_outer("__resp.results").alias("__pos", "r"))
        .where(F.col("r.url").isNotNull() & (F.col("r.url") != ""))
    )
    nonempty = lambda c: F.when(F.col(c) != "", F.col(c))  # noqa: E731
    category = F.coalesce(nonempty("r.category"), F.lit("web"))
    category = (
        F.when(category == "images", "images")
        .when(category == "news", "news")
        .otherwise("web")
    )
    description = F.coalesce(
        nonempty("r.description"), nonempty("r.snippet"), F.lit(""))
    source = F.coalesce(nonempty("r.source"), F.lit("AC-Engine"))
    is_img = category == "images"
    is_news = category == "news"
    w = Window.partitionBy("query", "page").orderBy("__pos")
    return items.select(
        "query", "page",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
        category.alias("category"),
        F.coalesce(F.col("r.title"), F.lit("")).alias("title"),
        F.col("r.url").alias("url"),
        description.alias("description"),
        source.alias("source"),
        F.when(is_img | is_news, F.col("r.imageUrl")).alias("image_url"),
        F.when(is_img, F.col("r.imageWidth")).alias("image_width"),
        F.when(is_img, F.col("r.imageHeight")).alias("image_height"),
        F.when(is_img, F.col("r.position")).alias("image_position"),
        F.when(is_news, nonempty("r.date")).alias("news_date"),
    )


RESPONSE_PARSERS = {"searxng": parse_searxng_response,
                    "ac-engine": parse_ac_response}


def parse_serp_pages(serp_pages: DataFrame, engine: str = "google") -> DataFrame:
    """serp_pages(engine, query, page, html) → exploded result rows with
    (page, position) ordering preserved."""
    parser = PARSERS[engine]
    return (
        serp_pages.where(F.col("engine") == engine)
        .withColumn("results", parser(F.col("html")))
        .select(
            "engine", "query", "page",
            F.posexplode("results").alias("position", "r"),
        )
        .select(
            "engine", "query", "page", "position",
            F.col("r.title").alias("title"),
            F.col("r.url").alias("url"),
            F.col("r.description").alias("description"),
            F.col("r.source").alias("source"),
            F.col("r.category").alias("category"),
        )
    )


def plan_and_limit(parsed: DataFrame, limit: int) -> DataFrame:
    """Page planner tail (SearchService.ts:282-306): order by (page, position)
    and keep the first ``limit`` results per query."""
    w = Window.partitionBy("query").orderBy("page", "position")
    return (
        parsed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
        .drop("rank")
    )


def merge_scrape_results(serp: DataFrame, scraped: DataFrame) -> DataFrame:
    """Search→scrape fan-out merge (SearchController.ts:346-381): a plain
    left join on url replaces the promise bookkeeping."""
    return serp.join(scraped, "url", "left")


# ---------------------------------------------------------------------------
# G1: Google search-URL builder (Google.ts:72-168)
# ---------------------------------------------------------------------------

# full locale tables copied verbatim from packages/libs/src/data/Google.ts
# (186 domains / 132 languages / 260 regions) + the engine's 21-country skip
# list — see anycrawl_spark/data/google_locales.py
from anycrawl_spark.data.google_locales import (  # noqa: E402
    LANGUAGES as GOOGLE_LANGUAGES,
    REGIONS as GOOGLE_REGIONS,
    SKIP_COUNTRIES as GOOGLE_SKIP_COUNTRIES,
    SUPPORTED_DOMAINS as GOOGLE_DOMAINS,
)

TIME_RANGE_MAP = {"day": "d", "week": "w", "month": "m", "year": "y"}
SAFE_SEARCH_MAP = {0: "off", 1: "medium", 2: "high"}


def build_google_url(query: str, page: int = 1, *, lang: str = "en",
                     country: str | None = None, limit: int | None = None,
                     time_range: str | None = None,
                     safe_search: int | None = None,
                     arc_rand: str = "fixture0000000000000000") -> str:
    """Deterministic re-expression of Google.buildSearchUrl
    (Google.ts:71-146): same locale resolution (skip-list-aware lang-country
    lookup, first-non-skipped-region fallback, US default), same parameter
    set and ordering. The arc id is ``srp_<rand23>_1<start padded to 2>``
    (generateAsyncParam, Google.ts:153-156) — only the 23 random chars are
    injectable; the ``_1NN`` suffix derives from the start offset and must
    vary per page."""
    from urllib.parse import urlencode

    eng_lang = GOOGLE_LANGUAGES.get(lang) or "en"
    lang_code = eng_lang.split("_")[1] if "_" in eng_lang else eng_lang
    resolved_country = None
    if lang and country:
        # skip-listed countries never resolve via the locale key
        if country not in GOOGLE_SKIP_COUNTRIES:
            resolved_country = GOOGLE_REGIONS.get(f"{lang}-{country}")
    if not resolved_country and lang:
        # first region for this lang whose country is not skip-listed
        resolved_country = next(
            (v for k, v in GOOGLE_REGIONS.items()
             if k.startswith(f"{lang}-") and v.upper() not in GOOGLE_SKIP_COUNTRIES),
            None)
    if not resolved_country:
        resolved_country = "US"
    per_page = min(max(limit, 1), 100) if limit else 10
    start = (page - 1) * per_page
    domain = GOOGLE_DOMAINS.get(resolved_country.upper(), "www.google.com")
    params = [
        ("q", query), ("start", str(start)),
        ("hl", f"{lang_code}-{resolved_country}"),
        ("lr", eng_lang), ("cr", f"country{resolved_country}"),
        ("ie", "utf8"), ("oe", "utf8"), ("filter", "0"),
        ("asearch", "arc"),
        ("async", f"arc_id:srp_{arc_rand}_1{start:02d},use_ac:true,_fmt:prog"),
    ]
    if limit:
        params.append(("num", str(per_page)))
    if time_range in TIME_RANGE_MAP:
        params.append(("tbs", f"qdr:{TIME_RANGE_MAP[time_range]}"))
    if safe_search is not None:
        params.append(("safe", SAFE_SEARCH_MAP.get(safe_search, "medium")))
    return f"https://{domain}/search?{urlencode(params)}"


# ---------------------------------------------------------------------------
# Engine-name resolution (SearchService.ts:57-213)
# ---------------------------------------------------------------------------
#
# Which engine actually serves a search request, given the deployment
# config. JS quirks pinned (re-expressed from behavior, no code copied):
#
# * getDefaultEngine (:57-75) does NOT lowercase — a configured default of
#   'Google' validates (isValidEngine lowercases internally) and is
#   returned with its ORIGINAL casing.
# * single-engine mode (:188-193) returns enabledEngines[0] VERBATIM and
#   ignores the request entirely.
# * the multiple-enabled branch (:196-201) compares the lowercased request
#   against the RAW enabled list (uppercase enabled entries never match)
#   and falls back to defaultEngine.toLowerCase() — the only lowercased
#   default in the file.
# * the default/enabled branch only runs when BOTH defaultEngine and a
#   non-empty enabledEngines are configured; otherwise the validated
#   normalized request wins.

AVAILABLE_SEARCH_ENGINES = ("google", "searxng", "ac-engine")


def _engine_valid(name: str, searxng_url, ac_engine_url) -> bool:
    """isValidEngine (SearchService.ts:82-99): google is always available;
    searxng / ac-engine require their URL config."""
    n = name.lower()
    if n == "google":
        return True
    if n == "searxng":
        return bool(searxng_url)
    if n == "ac-engine":
        return bool(ac_engine_url)
    return False


def available_search_engines(enabled_engines=None, searxng_url=None,
                             ac_engine_url=None) -> list[str]:
    """getAvailableEngines (SearchService.ts:104-110): the enabled list
    (lowercased, unknown names dropped) or all known engines, filtered to
    the ones whose config is present."""
    if enabled_engines:
        candidates = [e.lower() for e in enabled_engines
                      if e.lower() in AVAILABLE_SEARCH_ENGINES]
    else:
        candidates = list(AVAILABLE_SEARCH_ENGINES)
    return [e for e in candidates
            if _engine_valid(e, searxng_url, ac_engine_url)]


def default_search_engine(default_engine=None, enabled_engines=None,
                          searxng_url=None, ac_engine_url=None) -> str:
    """getDefaultEngine (SearchService.ts:57-75): the configured default
    (|| 'google') if its config validates — returned UN-normalized — else
    the first available engine, else the 'google' last resort."""
    requested = default_engine or "google"
    if _engine_valid(requested, searxng_url, ac_engine_url):
        return requested
    avail = available_search_engines(enabled_engines, searxng_url,
                                     ac_engine_url)
    return avail[0] if avail else "google"


def resolve_search_engine(requested=None, *, default_engine=None,
                          enabled_engines=None, searxng_url=None,
                          ac_engine_url=None) -> str:
    """resolveEngine + resolveEngineName (SearchService.ts:117-213)."""
    cfg = (enabled_engines, searxng_url, ac_engine_url)
    if not requested:          # undefined / '' -> default (:118-120)
        return default_search_engine(default_engine, *cfg)
    normalized = requested.lower().strip()
    if (not normalized or normalized == "default"
            or not _engine_valid(normalized, searxng_url, ac_engine_url)):
        return default_search_engine(default_engine, *cfg)
    if default_engine:
        if enabled_engines:
            if len(enabled_engines) == 1:
                return enabled_engines[0]          # verbatim, forced
            if normalized in enabled_engines:      # RAW list compare
                return normalized
            return default_engine.lower()
    return normalized
