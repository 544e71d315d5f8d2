"""URL canonicalization + uniqueKey semantics (SURVEY.md §2.2 F1/F2).

Re-expresses the reference's URL normalization:

- ``normalizeUrl`` — ``/root/reference/packages/libs/src/cache/index.ts:130-148``:
  lowercase hostname, strip trailing slash (except root), drop tracking params
  (utm_source, utm_medium, utm_campaign, utm_term, utm_content, fbclid, gclid),
  sort remaining query params; parse failure returns the input unchanged.
- crawlee ``Request.computeUniqueKey`` (dedup key) — referenced at
  ``/root/reference/packages/scrape/src/engines/Base.ts:464-473``: lowercased
  scheme/host, fragment stripped, prefixed with ``"{jobId}-"``.

Two implementations are provided with identical observable output on valid
http(s) URLs:

- :func:`normalize_url` — pure Python, used inside kernel tests and golden
  files.
- :func:`canonical_url_col` — a pyspark ``Column`` built from JVM-side
  functions only (no Python UDF), used in the crawl hot path so Catalyst can
  codegen it.
"""

from __future__ import annotations

import hashlib
from urllib.parse import quote, urljoin, urlsplit, urlunsplit

TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid",
)


def _split_query(query: str) -> list[str]:
    return [p for p in query.split("&") if p]


def _param_key(pair: str) -> str:
    return pair.split("=", 1)[0]


def normalize_url(url: str) -> str:
    """Pure-Python normalizeUrl with the reference's exact rule order."""
    try:
        parts = urlsplit(url)
        if not parts.scheme or not parts.netloc:
            return url
        host = parts.hostname.lower() if parts.hostname else ""
        netloc = host
        if parts.port is not None:
            default = {"http": 80, "https": 443}.get(parts.scheme.lower())
            if parts.port != default:
                netloc = f"{host}:{parts.port}"
        if parts.username:
            cred = parts.username + (f":{parts.password}" if parts.password else "")
            netloc = f"{cred}@{netloc}"
        path = parts.path
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]
        if not path:
            path = "/"
        pairs = [p for p in _split_query(parts.query) if _param_key(p) not in TRACKING_PARAMS]
        pairs.sort(key=_param_key)  # stable, key-only — URLSearchParams.sort() semantics
        query = "&".join(pairs)
        return urlunsplit((parts.scheme.lower(), netloc, path, query, parts.fragment))
    except (ValueError, AttributeError):
        return url


def unique_key(url: str, job_id: str | None = None) -> str:
    """Dedup key: fragment-stripped canonical URL, optionally job-scoped.

    Mirrors crawlee's ``${jobId}-${computeUniqueKey(url)}`` rewrite at
    ``Base.ts:464-473`` (dedup scope = job).
    """
    norm = normalize_url(url)
    norm = norm.split("#", 1)[0]
    return f"{job_id}-{norm}" if job_id else norm


def url_hash(url: str) -> str:
    """sha256 hex of the canonical URL (page_cache.urlHash, PostgreSQL.ts:364-397)."""
    return hashlib.sha256(normalize_url(url).encode("utf-8")).hexdigest()


def resolve_url(base_url: str, href: str) -> str | None:
    """Resolve a (possibly relative / malformed) href against a base URL.

    Mirrors ``HTMLTransformer.resolveUrl`` (HTMLTransformer.ts:514-532):
    repairs ``http:/x`` → ``http://x`` before resolution; on failure returns
    the original href.
    """
    fixed = href.strip()
    if fixed.startswith("http:/") and not fixed.startswith("http://"):
        fixed = "http://" + fixed[6:]
    elif fixed.startswith("https:/") and not fixed.startswith("https://"):
        fixed = "https://" + fixed[7:]
    try:
        resolved = urljoin(base_url, fixed)
        parts = urlsplit(resolved)
        if not parts.scheme:
            return href
        netloc = parts.netloc.lower()
        path = parts.path or ("/" if parts.netloc else "")
        return urlunsplit((parts.scheme.lower(), netloc, path, parts.query, parts.fragment))
    except ValueError:
        return href


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def origin_of(url: str) -> str:
    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
        default = {"http": 80, "https": 443}.get(scheme)
        if port is not None and port != default:
            return f"{scheme}://{host}:{port}"
        return f"{scheme}://{host}"
    except ValueError:
        return ""


def base_domain_of(host: str) -> str:
    """Last two DNS labels (MapService.ts:325-329)."""
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


# ---------------------------------------------------------------------------
# Spark Column builders (JVM-side; no Python in the hot path)
# ---------------------------------------------------------------------------

def canonical_url_col(col_name: str):
    """A pyspark Column computing normalize_url entirely with built-ins.

    Assumes well-formed absolute http(s) URLs (guaranteed for corpus URLs,
    which are produced by :func:`resolve_url`). Stays inside whole-stage
    codegen: parse_url / split / filter / array_sort / concat only.
    """
    from pyspark.sql import functions as F

    c = F.col(col_name)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    path = F.parse_url(c, F.lit("PATH"))
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"), F.expr(f"substring(parse_url({col_name}, 'PATH'), 1, length(parse_url({col_name}, 'PATH')) - 1)")
    ).otherwise(F.when(path == "", "/").otherwise(path))
    query = F.coalesce(F.parse_url(c, F.lit("QUERY")), F.lit(""))
    tracking = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    sorted_query = F.expr(
        f"array_join(array_sort(filter(split(coalesce(parse_url({col_name}, 'QUERY'), ''), '&'),"
        f" p -> p != '' AND NOT array_contains(array({tracking}), split(p, '=')[0])),"
        " (a, b) -> CASE WHEN split(a,'=')[0] < split(b,'=')[0] THEN -1"
        " WHEN split(a,'=')[0] > split(b,'=')[0] THEN 1 ELSE 0 END), '&')"
    )
    frag = F.parse_url(c, F.lit("REF"))
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(sorted_query != "", F.concat(F.lit("?"), sorted_query)).otherwise(F.lit("")),
        F.when(frag.isNotNull() & (frag != ""), F.concat(F.lit("#"), frag)).otherwise(F.lit("")),
    )


def url_hash_col(col_name: str):
    from pyspark.sql import functions as F

    return F.sha2(canonical_url_col(col_name), 256)


def host_col(col_name: str):
    from pyspark.sql import functions as F

    return F.lower(F.parse_url(F.col(col_name), F.lit("HOST")))
