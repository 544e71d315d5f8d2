"""Auto-engine selection: score a fetched page's JS requirement to decide
cheerio (static HTML) vs playwright (browser render).

Re-expresses the reference's heuristic
(packages/scrape/src/utils/autoEngine.ts:7-88,
``analyzeHtmlForJSRequirement``) twice:

- ``analyze_js_requirement``: pure-Python kernel with reason-string parity,
  used by tests and by anything driving per-row decisions in Python.
- ``js_score_col`` / ``engine_decision_col``: the same scoring as JVM
  regexp expressions — this is the 100-TB path (whole-stage codegen, no
  Python in the loop) for tagging a corpus with the engine each page would
  have needed.

The live half of the reference (resolveAutoEngine: per-domain cache + probe
fetch, autoEngine.ts:90-135) is out of corpus-replay scope; in replay the
decision is a column over the already-fetched ``html``.

Signals (weights copied from the reference — they define observable
semantics):
  +3 empty root container (#root/#app/#__next/#__nuxt immediately closed)
  +3 minimal visible text (<100 chars) in a non-trivial page (>2000 bytes)
  +3 noscript fallback content (>30 chars of text inside <noscript>)
  +1 each: __NEXT_DATA__, __NUXT__, window.__INITIAL_STATE__,
           data-reactroot, data-svelte;  +2 angular (ng-app/ng-controller)
  +2 high script density (>10 <script and visible text <500)
  -3 substantial text (>1000)  /  -1 moderate text (>500)
  -1 semantic container with >=200 chars of content
JS required iff score >= 3 → engine 'playwright', else 'cheerio'.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_BODY_RE = re.compile(r"<body[^>]*>([\s\S]*?)</body>", re.I)
_SCRIPT_RE = re.compile(r"<script[\s\S]*?</script>", re.I)
_STYLE_RE = re.compile(r"<style[\s\S]*?</style>", re.I)
_NOSCRIPT_RE = re.compile(r"<noscript[\s\S]*?</noscript>", re.I)
_NOSCRIPT_CAP_RE = re.compile(r"<noscript[^>]*>([\s\S]*?)</noscript>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_EMPTY_ROOT_RE = re.compile(
    r"id=[\"'](?:root|app|__next|__nuxt)[\"'][^>]*>\s*</div>", re.I)
_SEMANTIC_RE = re.compile(r"<(?:article|main)[^>]*>[\s\S]{200,}", re.I)
_SCRIPT_OPEN_RE = re.compile(r"<script", re.I)

_FRAMEWORKS: list[tuple[re.Pattern, str, int]] = [
    (re.compile(r"[\"']__NEXT_DATA__[\"']"), "nextjs-data", 1),
    (re.compile(r"__NUXT__"), "nuxt-state", 1),
    (re.compile(r"window\.__INITIAL_STATE__"), "initial-state", 1),
    (re.compile(r"data-reactroot", re.I), "react-hydrated", 1),
    (re.compile(r"ng-app|ng-controller", re.I), "angular", 2),
    (re.compile(r"data-svelte", re.I), "svelte", 1),
]

JS_REQUIRED_THRESHOLD = 3


def analyze_js_requirement(raw_html: str) -> dict:
    """→ {js_required, score, reasons} with reference reason-string parity."""
    raw_html = raw_html or ""
    reasons: list[str] = []
    score = 0

    m = _BODY_RE.search(raw_html)
    body_html = m.group(1) if m else ""
    content_html = _NOSCRIPT_RE.sub(
        "", _STYLE_RE.sub("", _SCRIPT_RE.sub("", body_html))).strip()
    visible_text = _WS_RE.sub(" ", _TAG_RE.sub("", content_html)).strip()

    if _EMPTY_ROOT_RE.search(raw_html):
        score += 3
        reasons.append("empty-root-container")
    if len(visible_text) < 100 and len(raw_html) > 2000:
        score += 3
        reasons.append(f"minimal-text:{len(visible_text)}")
    noscript_text = _TAG_RE.sub(
        "", "".join(_NOSCRIPT_CAP_RE.findall(raw_html))).strip()
    if len(noscript_text) > 30:
        score += 3
        reasons.append("noscript-fallback")

    for pat, name, weight in _FRAMEWORKS:
        if pat.search(raw_html):
            score += weight
            reasons.append(f"framework:{name}")

    script_count = len(_SCRIPT_OPEN_RE.findall(raw_html))
    if script_count > 10 and len(visible_text) < 500:
        score += 2
        reasons.append(f"high-scripts:{script_count}")

    if len(visible_text) > 1000:
        score -= 3
        reasons.append(f"substantial-text:{len(visible_text)}")
    elif len(visible_text) > 500:
        score -= 1
        reasons.append(f"moderate-text:{len(visible_text)}")
    if _SEMANTIC_RE.search(content_html):
        score -= 1
        reasons.append("has-semantic-content")

    return {"js_required": score >= JS_REQUIRED_THRESHOLD,
            "score": score, "reasons": reasons}


def _visible_text_col(html: Column) -> Column:
    body = F.regexp_extract(html, r"(?is)<body[^>]*>(.*?)</body>", 1)
    content = F.trim(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        body, r"(?is)<script.*?</script>", ""),
        r"(?is)<style.*?</style>", ""),
        r"(?is)<noscript.*?</noscript>", ""))
    return content, F.trim(F.regexp_replace(
        F.regexp_replace(content, r"<[^>]+>", ""), r"\s+", " "))


def js_score_col(html: Column | str) -> Column:
    """The reference scoring as one JVM expression tree (codegen-friendly,
    no Python). Returns the integer score."""
    html = F.col(html) if isinstance(html, str) else html
    content, visible = _visible_text_col(html)
    vlen = F.length(visible)

    def hit(pattern: str, weight: int) -> Column:
        return F.when(html.rlike(pattern), weight).otherwise(0)

    score = (
        hit(r"(?i)id=[\"'](root|app|__next|__nuxt)[\"'][^>]*>\s*</div>", 3)
        + F.when((vlen < 100) & (F.length(html) > 2000), 3).otherwise(0)
        + F.when(F.length(F.trim(F.regexp_replace(F.array_join(
            F.regexp_extract_all(
                html, F.lit(r"(?is)<noscript[^>]*>(.*?)</noscript>"), 1),
            ""), r"<[^>]+>", ""))) > 30, 3).otherwise(0)
        + hit(r"[\"']__NEXT_DATA__[\"']", 1)
        + hit(r"__NUXT__", 1)
        + hit(r"window\.__INITIAL_STATE__", 1)
        + hit(r"(?i)data-reactroot", 1)
        + hit(r"(?i)ng-app|ng-controller", 2)
        + hit(r"(?i)data-svelte", 1)
        + F.when(
            (F.size(F.regexp_extract_all(html, F.lit(r"(?i)(<script)"), 1)) > 10)
            & (vlen < 500), 2).otherwise(0)
        + F.when(vlen > 1000, -3).when(vlen > 500, -1).otherwise(0)
        + F.when(content.rlike(r"(?is)<(article|main)[^>]*>.{200,}"), -1)
           .otherwise(0)
    )
    return score.cast("int")


def engine_decision_col(html: Column | str) -> Column:
    """'playwright' when the page needs JS rendering, else 'cheerio'."""
    return F.when(js_score_col(html) >= JS_REQUIRED_THRESHOLD,
                  "playwright").otherwise("cheerio")


def resolve_wait_until(raw=None, default="domcontentloaded"):
    """libs/utils.ts:40-61 (resolveWaitUntil): map the request's
    wait_until into engine-specific values — Playwright keeps the three
    known states (anything else, including 'commit', degrades to
    domcontentloaded); Puppeteer renames networkidle -> networkidle0.
    ``default`` stands in for config.navigation.waitUntil."""
    configured = str(raw or default)
    playwright = configured if configured in (
        "networkidle", "load", "domcontentloaded") else "domcontentloaded"
    if configured == "networkidle":
        puppeteer = "networkidle0"
    elif configured in ("load", "domcontentloaded"):
        puppeteer = configured
    else:
        puppeteer = "domcontentloaded"
    return {"configured": configured, "playwright": playwright,
            "puppeteer": puppeteer}


# ---------------------------------------------------------------------------
# Screenshot-readiness adaptive wait hint (utils/screenshotReady.ts:300-344)
# ---------------------------------------------------------------------------
#
# The one deterministic core in the otherwise live-browser readiness file:
# every screenshot records its readiness time into a per-domain EWMA whose
# smoothing follows the sample count — alpha = 2 / (min(samples, 50) + 1)
# with the counter capped at 50 — and reads back a wait hint of
# ceil(avgMs) once the average exceeds 100 ms.
#
# The sequential fold telescopes: for the i-th observation alpha_i =
# 2/(i+1) while i <= 50, so the survival product
# prod_{j=i+1..n} (1 - alpha_j) = prod (j-1)/(j+1) collapses to
# i*(i+1) / (n*(n+1)), giving the CLOSED FORM
#
#     avg_n = sum_i 2*i*actual_i / (n*(n+1))          (n <= 50)
#
# — a triangular-weighted mean whose numerator is an exact integer sum,
# so the batch job needs one keyed window (row_number) plus one
# aggregation on the same key: a single shuffle, no sequential pass, no
# cross-engine float drift.  Past the cap alpha freezes at 2/51 and each
# earlier weight just decays by (49/51)^(n-50) — the pow legs below.


def screenshot_ready_fold(prev: tuple[float, int] | None,
                          actual_ms: float) -> tuple[float, int]:
    """The reference's sequential update (screenshotReady.ts:336-343),
    exact: returns (avgMs, samples) after folding one observation."""
    samples = min(((prev[1] if prev else 0) or 0) + 1, 50)
    alpha = 2 / (samples + 1)
    avg = alpha * actual_ms + (1 - alpha) * prev[0] if prev else actual_ms
    return avg, samples


def screenshot_ready_hint(samples: "DataFrame") -> "DataFrame":
    """Batch replay of the per-domain readiness cache: fold every
    domain's observations (in ``seq`` order) through the reference EWMA
    and emit the stored state + the read-side hint.

    samples(domain, seq, actual_ms) ->
    (domain, samples BIGINT [counter, capped at 50], avg_ms DOUBLE,
    hint_ms BIGINT [ceil(avg) when avg > 100, else NULL — the
    ``c.avgMs > 100`` read gate at :303]).
    """
    from pyspark.sql import DataFrame, Window  # noqa: F401

    wk = Window.partitionBy("domain")
    wo = wk.orderBy("seq")
    df = (samples
          .withColumn("__i", F.row_number().over(wo))
          .withColumn("__n", F.count("*").over(wk)))
    decay = F.lit(49.0 / 51.0)
    # exact-integer numerator for the first 50 observations
    num1 = F.sum(F.when(F.col("__i") <= 50,
                        2 * F.col("__i") * F.col("actual_ms"))
                 .otherwise(F.lit(0)).cast("long"))
    # post-cap observations carry frozen alpha = 2/51 and plain
    # (49/51)^(n-i) decay (empty -> 0.0 for the n <= 50 case)
    tail = F.sum(F.when(
        F.col("__i") > 50,
        F.col("actual_ms") * F.pow(decay, F.col("__n") - F.col("__i")))
        .otherwise(F.lit(0.0)))
    agg = df.groupBy("domain").agg(
        F.max("__n").alias("__n"), num1.alias("__num1"),
        tail.alias("__tail"))
    capped = F.least(F.col("__n"), F.lit(50))
    avg = (
        F.col("__num1").cast("double") / (capped * (capped + 1))
        * F.pow(decay, F.greatest(F.col("__n") - 50, F.lit(0)))
        + F.col("__tail") * (2.0 / 51.0)
    )
    return agg.select(
        "domain", capped.cast("bigint").alias("samples"),
        avg.alias("avg_ms"),
        F.when(avg > 100, F.ceil(avg)).cast("bigint").alias("hint_ms"))
