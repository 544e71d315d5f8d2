"""Template system: ID validation + domain restriction (SURVEY.md §2.9).

The reference's template system runs sandboxed user JS per page (out of
corpus-replay scope — covered as the user-transform hook on the extraction
UDF); its deterministic pre-navigation VALIDATION layer is ported here:

- template-ID format rules (TemplateValidator.ts:66-106 validateTemplateId:
  non-empty trimmed string, ``[a-zA-Z0-9_-]+``, <= 100 chars) plus the
  availability blacklist (:117-140);
- domain restrictions (template-client/src/validator/domainValidator.ts):
  ``parseDomainRestriction`` input forms (string / array / {type, patterns}
  with comma-splitting normalization), ``validatePattern`` (lowercased
  exact-or-glob over plain values), and ``validateDomain`` — exact mode
  compares the JS-URL-normalized form (lowercased origin + path + query +
  hash) or the bare hostname; glob mode matches a candidate set of URL
  representations (hostname / origin / with-and-without trailing slash /
  with-and-without query+hash, domainValidator.ts:188-235) against
  minimatch patterns. Glob matching reuses the crawl engine's
  minimatch-parity translator (politeness.glob_to_regex).

Batch form: ``template_allowed_udf`` validates a URL column against one
restriction (compiled once, Arrow-batched) — the map/crawl-side gate for
"which URLs may this template run on".
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from anycrawl_spark.politeness import glob_to_regex

# \Z, not $: Python's $ also matches before a trailing newline, which the
# JS /...$/ anchor (no m-flag) does not
TEMPLATE_ID_RE = re.compile(r"^[a-zA-Z0-9_-]+\Z")
BLACKLISTED_TEMPLATES = ("test-invalid", "deprecated-template")


def validate_template_id(template_id) -> dict:
    """TemplateValidator.validateTemplateId + validateTemplateAvailability:
    returns {is_valid, error, code} with the reference's codes/messages."""
    if not template_id or not isinstance(template_id, str):
        return {"is_valid": False,
                "error": "Template ID is required and must be a string",
                "code": "INVALID_TEMPLATE_ID"}
    if not template_id.strip():
        return {"is_valid": False, "error": "Template ID cannot be empty",
                "code": "EMPTY_TEMPLATE_ID"}
    if not TEMPLATE_ID_RE.match(template_id):
        return {"is_valid": False,
                "error": "Template ID can only contain alphanumeric "
                         "characters, hyphens, and underscores",
                "code": "INVALID_TEMPLATE_ID_FORMAT"}
    if len(template_id) > 100:
        return {"is_valid": False,
                "error": "Template ID cannot exceed 100 characters",
                "code": "TEMPLATE_ID_TOO_LONG"}
    if template_id in BLACKLISTED_TEMPLATES:
        return {"is_valid": False,
                "error": f"Template '{template_id}' is not available or "
                         f"has been deprecated",
                "code": "TEMPLATE_NOT_AVAILABLE"}
    return {"is_valid": True, "error": None, "code": None}


def parse_domain_restriction(allowed_domains) -> dict | None:
    """domainValidator.parseDomainRestriction: accepts a single pattern
    string, a list, or {type, patterns}; comma-delimited entries split;
    non-strings dropped; empty result -> None (no restriction)."""
    if isinstance(allowed_domains, str):
        parsed = {"type": "exact", "patterns": [allowed_domains]}
    elif isinstance(allowed_domains, list):
        parsed = {"type": "exact", "patterns": allowed_domains}
    elif isinstance(allowed_domains, dict) and "patterns" in allowed_domains:
        if not isinstance(allowed_domains["patterns"], list):
            return None
        # JS `{ type = 'exact' }` defaults only when type is undefined
        # (absent key); an explicit null STAYS null, and a null type
        # matches neither branch in validate_domain — every URL is then
        # DOMAIN_NOT_ALLOWED (fail closed, like the reference)
        parsed = {"type": allowed_domains.get("type", "exact"),
                  "patterns": allowed_domains["patterns"]}
    else:
        return None
    patterns: list[str] = []
    for p in parsed["patterns"]:
        if not isinstance(p, str):
            continue
        patterns.extend(s.strip() for s in p.split(",") if s.strip())
    if not patterns:
        return None
    return {"type": parsed["type"], "patterns": patterns}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 dot-segment resolution — JS `new URL()` applies it to
    pathname ('/a/./b' -> '/a/b', '/a/../b' -> '/b')."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    # preserve a trailing slash produced by '.'/'..' endings
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    resolved = "/".join(out)
    return resolved if resolved.startswith("/") else "/" + resolved


def _split_js_url(url: str):
    """JS-URL pieces (lowercased scheme/host, IDN hosts punycoded, default
    port dropped, dot-segments resolved); None when the URL has no
    scheme+host or any component is malformed (JS `new URL` would throw —
    the callers map that to INVALID_URL, never an exception).

    Remaining JS-URL divergence (documented approximation): percent-
    encoding is kept verbatim rather than re-encoded, so an exact-mode
    pattern must use the same encoding as the incoming URLs."""
    try:
        parts = urlsplit(url)
        if not parts.scheme or not parts.hostname:
            return None
        scheme = parts.scheme.lower()
        host = parts.hostname.lower()
        if any(ord(c) > 127 for c in host):
            host = host.encode("idna").decode("ascii")
        port = parts.port   # raises on malformed/out-of-range ports
    except (ValueError, UnicodeError):
        return None
    default = {"http": 80, "https": 443}.get(scheme)
    origin = f"{scheme}://{host}" + (f":{port}" if port and port != default
                                     else "")
    pathname = _remove_dot_segments(parts.path or "/")
    query = f"?{parts.query}" if parts.query else ""
    fragment = f"#{parts.fragment}" if parts.fragment else ""
    return origin, host, pathname, query, fragment


def normalize_url_for_comparison(url: str) -> str | None:
    """domainValidator.normalizeUrlForComparison: lowercased origin + the
    path/query/hash exactly as given (no trailing-slash addition)."""
    pieces = _split_js_url(url)
    if pieces is None:
        return None
    origin, _, pathname, query, fragment = pieces
    return f"{origin}{pathname}{query}{fragment}"


@lru_cache(maxsize=1024)
def _compiled_glob(pattern: str) -> re.Pattern:
    # dot=False: domainValidator calls minimatch with DEFAULT options —
    # unlike the crawl-scope matcher, which passes {dot: true} upstream
    return re.compile(glob_to_regex(pattern, dot=False))


def _glob_match(value: str, pattern: str) -> bool:
    return _compiled_glob(pattern).fullmatch(value) is not None


def validate_pattern(value: str, restriction: dict | None,
                     field_name: str = "value") -> dict:
    """domainValidator.validatePattern: lowercased+trimmed value against
    exact or glob patterns (generic keyword matching)."""
    if not restriction or not restriction.get("patterns"):
        return {"is_valid": True, "error": None, "code": None}
    normalized = value.lower().strip()
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        p = pattern.lower().strip()
        if restriction.get("type") == "exact":
            if normalized == p:
                return {"is_valid": True, "error": None, "code": None}
        elif restriction.get("type") == "glob":
            if _glob_match(normalized, p):
                return {"is_valid": True, "error": None, "code": None}
    return {"is_valid": False,
            "error": f"{field_name} '{value}' is not allowed for this "
                     f"template. Allowed patterns: "
                     f"{', '.join(restriction['patterns'])}",
            "code": "PATTERN_NOT_ALLOWED"}


def _glob_candidates(url: str) -> set[str] | None:
    """The URL-representation candidate set glob patterns are tried against
    (domainValidator.matchesGlobPattern:188-235)."""
    pieces = _split_js_url(url)
    if pieces is None:
        return None
    origin, host, pathname, query, fragment = pieces
    target = f"{origin}{pathname}{query}{fragment}"
    with_slash = "/" if pathname == "/" else re.sub(r"/+$", "/", pathname)
    no_slash = "/" if pathname == "/" else re.sub(r"/+$", "", pathname)
    cands = {
        target, origin,
        f"{origin}{with_slash}", f"{origin}{no_slash}",
        f"{origin}{with_slash}{query}{fragment}",
        f"{origin}{no_slash}{query}{fragment}",
        host,
        f"{host}{with_slash}", f"{host}{no_slash}",
        f"{host}{with_slash}{query}{fragment}",
        f"{host}{no_slash}{query}{fragment}",
    }
    if no_slash.startswith("/") and no_slash != "/":
        bare = no_slash[1:]
        cands.add(f"{host}/{bare}")
        cands.add(f"{host}/{bare}{query}{fragment}")
    return cands


def validate_domain(url: str, restriction: dict | None) -> dict:
    """domainValidator.validateDomain: exact mode matches the normalized
    URL or the bare hostname; glob mode matches any candidate
    representation against minimatch patterns; unparsable URLs fail with
    INVALID_URL."""
    if not restriction or not restriction.get("patterns"):
        return {"is_valid": True, "error": None, "code": None}
    pieces = _split_js_url(url)
    if pieces is None:
        return {"is_valid": False, "error": f"Invalid URL format: {url!r}",
                "code": "INVALID_URL"}
    origin, host, pathname, query, fragment = pieces
    target = f"{origin}{pathname}{query}{fragment}"
    cands = None   # built once, not per pattern
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        if restriction.get("type") == "exact":
            normalized_pattern = normalize_url_for_comparison(pattern)
            if normalized_pattern and normalized_pattern == target:
                return {"is_valid": True, "error": None, "code": None}
            if host == pattern.lower():
                return {"is_valid": True, "error": None, "code": None}
        elif restriction.get("type") == "glob":
            if cands is None:
                cands = _glob_candidates(url)
            p = pattern.lower()
            if cands and any(_glob_match(c, p) for c in cands):
                return {"is_valid": True, "error": None, "code": None}
    return {"is_valid": False,
            "error": f"URL '{target}' is not allowed for this template. "
                     f"Allowed patterns: {', '.join(restriction['patterns'])}",
            "code": "DOMAIN_NOT_ALLOWED"}


def make_template_allowed_udf(restriction: dict | None):
    """Arrow-batched URL gate for one template's domain restriction —
    regexes compiled once per executor, applied per batch."""

    @F.pandas_udf(BooleanType())
    def allowed(url: pd.Series) -> pd.Series:
        return url.map(
            lambda u: validate_domain(u or "", restriction)["is_valid"])

    return allowed


# --- Template code validation (template-client/src/validator/index.ts +
# constants/security.ts DANGEROUS_PATTERNS) ---------------------------------

# flags mirror the JS literals exactly: every pattern is /gi except the
# bare Function-constructor check, which is case-SENSITIVE (/g)
DANGEROUS_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"require\s*\(", re.I), "require() is not allowed"),
    (re.compile(r"import\s+", re.I), "import statements are not allowed"),
    (re.compile(r"process\.", re.I), "process object is not allowed"),
    (re.compile(r"child_process", re.I), "child_process module is not allowed"),
    (re.compile(r"fs\.", re.I), "fs module is not allowed"),
    (re.compile(r"__dirname", re.I), "__dirname is not allowed"),
    (re.compile(r"__filename", re.I), "__filename is not allowed"),
    (re.compile(r"global\.", re.I), "global object is not allowed"),
    (re.compile(r"globalThis\.", re.I), "globalThis is not allowed"),
    (re.compile(r"\bFunction\s*\("), "Function constructor is not allowed"),
    (re.compile(r"eval\s*\(", re.I), "eval() is not allowed"),
    (re.compile(r"new\s+Function", re.I), "new Function is not allowed"),
    (re.compile(r"AsyncFunction", re.I),
     "AsyncFunction constructor is not allowed"),
    (re.compile(r"GeneratorFunction", re.I), "GeneratorFunction is not allowed"),
    (re.compile(r"__proto__\s*=", re.I), "__proto__ assignment is not allowed"),
    (re.compile(r"Object\.setPrototypeOf", re.I),
     "Object.setPrototypeOf is not allowed"),
    (re.compile(r"Object\.defineProperty", re.I),
     "Object.defineProperty is not allowed"),
    (re.compile(r"Object\.defineProperties", re.I),
     "Object.defineProperties is not allowed"),
    (re.compile(r"Reflect\.construct", re.I),
     "Reflect.construct is not allowed"),
    (re.compile(r"Reflect\.apply", re.I), "Reflect.apply is not allowed"),
    (re.compile(r"new\s+Proxy", re.I), "new Proxy is not allowed"),
    (re.compile(r"Symbol\.for", re.I), "Symbol.for is not allowed"),
    (re.compile(r"\.constructor\.constructor", re.I),
     "constructor chain is not allowed"),
]

MAX_NESTING_DEPTH = 20   # validator/index.ts:88
MAX_LOOPS = 10           # validator/index.ts:117
_LOOP_PATTERNS = [re.compile(r"for\s*\("), re.compile(r"while\s*\("),
                  re.compile(r"do\s*{")]


def validate_template_code(code: str) -> dict:
    """TemplateCodeValidator security + complexity rules (the syntax check
    compiles the code in a JS VM — a live seam here; the reference's OWN
    test file also still expects messages from patterns the current source
    has commented out, e.g. the setTimeout ban — we follow the source).
    Returns {is_valid, error} with the first violation's message, prefixed
    'Security violation: ' exactly as the reference throws it."""
    for pattern, message in DANGEROUS_PATTERNS:
        if pattern.search(code):
            return {"is_valid": False,
                    "error": f"Security violation: {message}"}
    depth = max_depth = 0
    for ch in code:
        if ch in "{([":
            depth += 1
            max_depth = max(max_depth, depth)
        elif ch in "})]":
            depth -= 1
    if max_depth > MAX_NESTING_DEPTH:
        return {"is_valid": False,
                "error": f"Code nesting too deep (max {MAX_NESTING_DEPTH} "
                         f"levels)"}
    loops = sum(len(p.findall(code)) for p in _LOOP_PATTERNS)
    if loops > MAX_LOOPS:
        return {"is_valid": False, "error": f"Too many loops (max {MAX_LOOPS})"}
    return {"is_valid": True, "error": None}
