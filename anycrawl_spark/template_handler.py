"""Template payload merge + URL/query placeholder rendering (SURVEY §3.1
step 2): every template-driven scrape/crawl/search request passes through
this layer BEFORE the schema parse.

Deterministic replica of the reference's request-side template plumbing:

- ``merge_options_with_template`` — shallow merge, request wins for
  non-null values (apps/api/src/utils/optionMerger.ts:13-27);
- ``deep_merge_options_with_template`` — recursive variant
  (optionMerger.ts:38-67);
- ``render_url_template`` / ``render_text_template`` — ``{{ name |
  filter }}`` placeholder substitution with raw/query/path/host filters,
  ``\\{{`` escaping, keep-on-missing semantics
  (apps/api/src/utils/urlTemplate.ts:61-101);
- ``validate_variables`` / ``apply_variable_defaults`` /
  ``map_variables_to_request_data`` — template-variable typing, defaults,
  and dotted-path request mapping with explicit-params > variables >
  defaultValue precedence (templateHandler.ts:547-768);
- ``apply_transform`` — optional regex extraction then template/append
  url+query transforms (templateHandler.ts:460-522);
- ``merge_request_with_template`` — the full pipeline
  (templateHandler.ts:314-421) including domain/keyword restriction
  enforcement and search's schema-type field filtering;
- ``process_request`` — merge + the controller-side render step
  (ScrapeController.ts:91-95 / SearchController.ts:60-64).

JS-undefined vs JS-null is load-bearing throughout (a request field set
to ``null`` is *skipped* by the shallow merge but *deletes* nothing,
while an absent field lets template values through unchanged); the
module-level ``MISSING`` sentinel models ``undefined``, Python ``None``
models ``null``.

Batch form: ``make_process_request_udf`` runs the whole pipeline over a
column of request-JSON against one template config (compiled once,
Arrow-batched) — the intake-side operator a template-driven crawl fans
out from.
"""

from __future__ import annotations

import json
import math
import re
from urllib.parse import quote

import pandas as pd

from anycrawl_spark.template import (
    parse_domain_restriction,
    validate_domain,
    validate_pattern,
)

# JS `undefined` (absent) — distinct from None (JS null) everywhere below.
MISSING = object()


class TemplateExecutionError(Exception):
    """template-client's TemplateExecutionError — raised when domain or
    keyword restrictions reject the merged request
    (templateHandler.ts:371,386)."""


# ---------------------------------------------------------------------------
# JS scalar coercion helpers
# ---------------------------------------------------------------------------

# String.prototype.trim's WhiteSpace ++ LineTerminator set (ES2023) — wider
# than Python str.strip's default on \x85 (Python strips it, JS does not)
# and narrower on nothing we care about; spell it out.
_JS_TRIM_CHARS = (
    "\t\n\v\f\r \xa0        "
    "        　﻿"
)


def js_trim(s: str) -> str:
    return s.strip(_JS_TRIM_CHARS)


def js_number_to_string(x) -> str:
    """ECMA-262 Number::toString(10): shortest-roundtrip digits with JS
    notation rules — fixed notation for decimal exponents in (-6, 21],
    otherwise exponential with an UNPADDED exponent ('1e-7', '1.2e+21';
    Python repr would give '1e-07' and switch to e-notation at 1e-5)."""
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, int):
        if -(2**53) < x < 2**53:
            return str(x)
        x = float(x)    # JSON ints are doubles in JS: 2^53+1 -> ...992
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0:
        return "0"                       # String(-0) === "0"
    sign = "-" if x < 0 else ""
    # shortest round-trip digit string + decimal-point position n:
    # value = 0.digits * 10^n
    s = repr(abs(x))
    if "e" in s:
        mant, exp = s.split("e")
        digits = mant.replace(".", "").rstrip("0") or "0"
        point = mant.index(".") if "." in mant else len(mant)
        n = int(exp) + point
    elif "." in s:
        int_part, frac = s.split(".")
        if int_part == "0":
            stripped = frac.lstrip("0")
            n = -(len(frac) - len(stripped))
            digits = stripped.rstrip("0")
        else:
            digits = (int_part + frac).rstrip("0")
            n = len(int_part)
    else:   # float repr always carries '.' or 'e'
        raise AssertionError(f"unexpected float repr {s!r}")
    k = len(digits)
    if k <= n <= 21:
        return sign + digits + "0" * (n - k)
    if 0 < n <= 21:
        return sign + digits[:n] + "." + digits[n:]
    if -6 < n <= 0:
        return sign + "0." + "0" * (-n) + digits
    e = n - 1
    head = digits[0] + ("." + digits[1:] if k > 1 else "")
    return sign + head + "e" + ("+" if e >= 0 else "-") + str(abs(e))


def to_string_value(v) -> str:
    """urlTemplate.ts:16-25 toStringValue: null/undefined -> "", strings
    verbatim, numbers/booleans via String(), everything else
    JSON.stringify."""
    if v is None or v is MISSING:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_number_to_string(v)
    try:
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
    except (TypeError, ValueError):
        return str(v)


def _js_typeof(v) -> str:
    if v is MISSING:
        return "undefined"
    if isinstance(v, str):
        return "string"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    return "object"   # dict, list, None (typeof null === 'object')


def _js_strict_eq(a, b) -> bool:
    """=== for JSON scalars: booleans never equal numbers, 1 === 1.0."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    return type(a) is type(b) and a == b


# ---------------------------------------------------------------------------
# {{ placeholder }} rendering (urlTemplate.ts)
# ---------------------------------------------------------------------------

_PLACEHOLDER_RE = re.compile(
    r"\{\{\s*([A-Za-z0-9_.]+)(?:\s*\|\s*(raw|query|path|host))?\s*\}\}")
_ESCAPED_LEFT = "__AC_ESCAPED_LEFT__"


def encode_uri_component(s: str) -> str:
    """encodeURIComponent: unreserved set A-Za-z0-9 - _ . ! ~ * ' ( ),
    UTF-8 percent-encoding, uppercase hex (urllib.parse.quote matches)."""
    return quote(s, safe="!'()*-._~")


def _filter_query(v: str) -> str:
    return encode_uri_component(v)


def _filter_path(v: str) -> str:
    # urlTemplate.ts:35-42: encode then restore '/' (either hex case)
    return re.sub("%2F", "/", encode_uri_component(v), flags=re.IGNORECASE)


def _filter_host(v) -> str:
    # urlTemplate.ts:44-47: stringify, lower-case, keep [a-z0-9.-] only
    return re.sub(r"[^a-z0-9.-]", "", to_string_value(v).lower())


def _get_by_path(obj, path: str):
    """urlTemplate.ts:5-14 getByPath — MISSING when any hop is absent or
    crosses a null; JS property quirks kept for the string/array 'length'
    hop and numeric array indices."""
    if not obj or not path:
        return MISSING
    cur = obj
    for part in path.split("."):
        if cur is None or cur is MISSING:
            return MISSING
        if isinstance(cur, dict):
            cur = cur.get(part, MISSING)
        elif isinstance(cur, (list, str)):
            if part == "length":
                cur = len(cur)
            elif isinstance(cur, list) and part.isdigit():
                i = int(part)
                cur = cur[i] if i < len(cur) else MISSING
            else:
                return MISSING
        else:
            return MISSING
    return cur


def _render_internal(template: str, variables, allow_filters: bool) -> str:
    if not isinstance(template, str) or template == "":
        return template
    inp = template.replace("\\{{", _ESCAPED_LEFT)

    def repl(m: re.Match) -> str:
        val = _get_by_path(variables, m.group(1))
        if val is MISSING:
            return m.group(0)   # keep original when missing
        sval = to_string_value(val)
        filt = (m.group(2) or "raw") if allow_filters else "raw"
        if filt == "query":
            return _filter_query(sval)
        if filt == "path":
            return _filter_path(sval)
        if filt == "host":
            return _filter_host(sval)
        return sval

    return _PLACEHOLDER_RE.sub(repl, inp).replace(_ESCAPED_LEFT, "{{")


def render_url_template(template: str, variables=None) -> str:
    """URL fields (scrape/crawl): filters active (urlTemplate.ts:84-91)."""
    try:
        return _render_internal(template, variables, True)
    except Exception:
        return template


def render_text_template(template: str, variables=None) -> str:
    """Plain-text fields (search.query): filters degrade to raw
    (urlTemplate.ts:94-101)."""
    try:
        return _render_internal(template, variables, False)
    except Exception:
        return template


# ---------------------------------------------------------------------------
# Option merging (optionMerger.ts)
# ---------------------------------------------------------------------------

def merge_options_with_template(template_options: dict,
                                request_options: dict) -> dict:
    """Shallow merge: template as base, request keys override only when the
    request value is neither undefined nor null (optionMerger.ts:13-27)."""
    merged = dict(template_options)
    for key, value in (request_options or {}).items():
        if value is not None and value is not MISSING:
            merged[key] = value
    return merged


def deep_merge_options_with_template(request_options: dict,
                                     template_options: dict) -> dict:
    """Recursive variant: nested plain objects merge key-wise, arrays and
    scalars replace wholesale (optionMerger.ts:38-67)."""
    merged = dict(template_options)
    for key, value in (request_options or {}).items():
        if value is None or value is MISSING:
            continue
        tpl_value = template_options.get(key)
        if isinstance(value, dict) and isinstance(tpl_value, dict):
            merged[key] = deep_merge_options_with_template(value, tpl_value)
        else:
            merged[key] = value
    return merged


# ---------------------------------------------------------------------------
# Template variables (templateHandler.ts:547-768)
# ---------------------------------------------------------------------------

def get_nested_value(obj, path: str):
    """TemplateVariableMapper.getNestedValue — MISSING on empty path, empty
    segment, or a hop through null/undefined (templateHandler.ts:578-594)."""
    if not path:
        return MISSING
    cur = obj
    for segment in path.split("."):
        if not segment or cur is None or cur is MISSING:
            return MISSING
        cur = cur.get(segment, MISSING) if isinstance(cur, dict) else MISSING
    return cur


def set_nested_value(target: dict, path: str, value) -> None:
    """TemplateVariableMapper.setNestedValue — creates {} through non-object
    hops; empty segments are skipped mid-path (the reference's ``continue``),
    so ``a..b`` writes ``a.b`` even though getNestedValue('a..b') is
    undefined (templateHandler.ts:596-621, quirk kept)."""
    if not path:
        return
    segments = path.split(".")
    cur = target
    while len(segments) > 1:
        segment = segments.pop(0)
        if not segment:
            continue
        if not isinstance(cur.get(segment), dict):
            cur[segment] = {}
        cur = cur[segment]
    final = segments.pop() if segments else ""
    if final:
        cur[final] = value


def map_variables_to_request_data(variables, template: dict,
                                  request_data: dict) -> dict:
    """Write each mapped variable to its dotted target UNLESS the request
    already carries a non-null value there — explicit params > variables
    (templateHandler.ts:548-576)."""
    if not variables or variables is MISSING or not template.get("variables"):
        return dict(request_data)
    updated = dict(request_data)
    for name, value in variables.items():
        config = template["variables"].get(name) or {}
        target = (config.get("mapping") or {}).get("target")
        if not target:
            continue
        existing = get_nested_value(updated, target)
        if existing is not MISSING and existing is not None:
            continue
        set_nested_value(updated, target, value)
    return updated


def _is_valid_js_url(value: str) -> bool:
    """`new URL(value)` viability for the absolute-URL case the `url`
    variable type guards (templateHandler.ts:703-707)."""
    from anycrawl_spark.template import _split_js_url
    return _split_js_url(value) is not None


def validate_variables(variable_definitions, provided_variables,
                       request_data=None) -> list[str]:
    """templateHandler.ts:631-737 validateVariables, returning the error
    list (the reference throws the joined message — see
    merge_request_with_template)."""
    if not variable_definitions or variable_definitions is MISSING:
        return []
    errors: list[str] = []
    provided = (provided_variables
                if isinstance(provided_variables, dict) else None)

    for name, definition in variable_definitions.items():
        if not (definition or {}).get("required"):
            continue
        value = (provided or {}).get(name, MISSING)
        has_value = value is not MISSING and value is not None
        has_default = "defaultValue" in (definition or {})
        has_mapped_target = False
        target = ((definition or {}).get("mapping") or {}).get("target")
        if target and request_data is not None:
            tv = get_nested_value(request_data, target)
            has_mapped_target = tv is not MISSING and tv is not None
        if not has_value and not has_default and not has_mapped_target:
            errors.append(f"Required variable '{name}' is missing")

    if provided:
        for name, value in provided.items():
            definition = variable_definitions.get(name)
            if not definition:
                errors.append(
                    f"Unknown variable '{name}' not defined in template")
                continue
            if value is None or value is MISSING:
                continue
            vtype = definition.get("type")
            actual = _js_typeof(value)
            if vtype == "string":
                if actual != "string":
                    errors.append(f"Variable '{name}' must be a string, "
                                  f"got {actual}")
            elif vtype == "number":
                if actual != "number" or (isinstance(value, float)
                                          and not math.isfinite(value)):
                    errors.append(f"Variable '{name}' must be a finite "
                                  f"number, got {actual}")
            elif vtype == "boolean":
                if actual != "boolean":
                    errors.append(f"Variable '{name}' must be a boolean, "
                                  f"got {actual}")
            elif vtype == "url":
                if actual != "string":
                    errors.append(f"Variable '{name}' must be a string "
                                  f"(URL), got {actual}")
                elif not _is_valid_js_url(value):
                    errors.append(f"Variable '{name}' must be a valid URL")
            elif vtype == "enum":
                allowed = definition.get("values")
                if (not isinstance(allowed, list) or not allowed) and \
                        isinstance(definition.get("options"), list):
                    allowed = [o.get("value", MISSING)
                               for o in definition["options"]
                               if isinstance(o, dict)]
                    allowed = [v for v in allowed if v is not MISSING]
                if not isinstance(allowed, list) or not allowed:
                    errors.append(f"Variable '{name}' enum has no values "
                                  f"defined")
                    continue
                if not any(_js_strict_eq(value, a) for a in allowed):
                    allowed_s = ", ".join(
                        json.dumps(a, separators=(",", ":")) for a in allowed)
                    errors.append(
                        f"Variable '{name}' must be one of [{allowed_s}], "
                        f"got {json.dumps(value, separators=(',', ':'))}")
            else:
                errors.append(f"Variable '{name}' has unknown type "
                              f"'{vtype}'")
    return errors


def apply_variable_defaults(variable_definitions, provided_variables):
    """templateHandler.ts:739-768 — three-way return: merged dict when a
    default applied or the caller provided a non-empty dict, otherwise the
    provided value unchanged (MISSING stays MISSING: the caller's
    ``!== undefined`` branch depends on it)."""
    if not variable_definitions or variable_definitions is MISSING:
        return provided_variables
    provided = (provided_variables
                if isinstance(provided_variables, dict) else None)
    merged = dict(provided) if provided else {}
    default_applied = False
    for name, definition in variable_definitions.items():
        if merged.get(name, MISSING) is MISSING or merged.get(name) is None:
            if "defaultValue" in (definition or {}):
                merged[name] = definition["defaultValue"]
                default_applied = True
    if provided:
        return merged
    if default_applied:
        return merged
    return provided_variables


# ---------------------------------------------------------------------------
# url/query transforms (templateHandler.ts:460-522)
# ---------------------------------------------------------------------------

_JS_REGEX_FLAGS = {"i": re.IGNORECASE, "m": re.MULTILINE, "s": re.DOTALL,
                   "u": 0, "g": 0, "y": 0}


def _compile_js_regex(pattern: str, flags: str):
    py_flags = 0
    for ch in flags or "":
        if ch not in _JS_REGEX_FLAGS:
            raise ValueError(f"unknown flag {ch}")
        py_flags |= _JS_REGEX_FLAGS[ch]
    return re.compile(pattern, py_flags)


def _js_replace_all(pattern: re.Pattern, replacement: str,
                    subject: str) -> str:
    """String.replace(regexp-with-g, string) `$` substitution semantics:
    $$ -> $, $& -> match, $` -> prefix, $' -> suffix; $n beyond the group
    count stays literal (our placeholder patterns have no groups)."""
    def repl(m: re.Match) -> str:
        out, i = [], 0
        while i < len(replacement):
            ch = replacement[i]
            if ch == "$" and i + 1 < len(replacement):
                nxt = replacement[i + 1]
                if nxt == "$":
                    out.append("$")
                    i += 2
                    continue
                if nxt == "&":
                    out.append(m.group(0))
                    i += 2
                    continue
                if nxt == "`":
                    out.append(m.string[:m.start()])
                    i += 2
                    continue
                if nxt == "'":
                    out.append(m.string[m.end():])
                    i += 2
                    continue
            out.append(ch)
            i += 1
        return "".join(out)

    return pattern.sub(repl, subject)


def apply_transform(original_value: str, transform, placeholder: str) -> str:
    """templateHandler.ts:460-522 applyTransform: optional regex extraction,
    then template ({{url}}/{{query}} substitution) or append
    (prefix+subject+suffix) mode; disabled/unknown modes pass through."""
    if not transform or not transform.get("enabled"):
        return original_value

    subject = original_value
    re_cfg = transform.get("regexExtract") or None
    if re_cfg and re_cfg.get("pattern"):
        try:
            rx = _compile_js_regex(re_cfg["pattern"], re_cfg.get("flags"))
            # JS String.match: with /g/ an array of full matches (no
            # groups); without, [full, g1, g2, ...] where a non-matching
            # group is undefined and `match[i] ?? match[0]` falls back
            if "g" in (re_cfg.get("flags") or ""):
                arr = [m.group(0) for m in rx.finditer(subject)] or None
            else:
                m = rx.search(subject)
                arr = ([m.group(0)] + list(m.groups())) if m else None
            if arr:
                group = re_cfg.get("group")
                gi = group if (isinstance(group, int)
                               and not isinstance(group, bool)) else 0
                picked = arr[gi] if 0 <= gi < len(arr) else arr[0]
                subject = picked if picked is not None else arr[0]
                if re_cfg.get("trim") is not False:
                    subject = js_trim(subject)
        except (ValueError, re.error):
            pass   # invalid regex config: fall back to the original subject

    mode = transform.get("mode")
    if mode == "template":
        if not transform.get("template"):
            return subject
        ph = re.compile(r"\{\{" + re.escape(placeholder) + r"\}\}")
        return _js_replace_all(ph, subject, transform["template"])
    if mode == "append":
        prefix = transform.get("prefix") or ""
        suffix = transform.get("suffix") or ""
        if not prefix and not suffix:
            return subject
        return f"{prefix}{subject}{suffix}"
    return subject


# ---------------------------------------------------------------------------
# Access + pricing + full pipeline (templateHandler.ts:30-455)
# ---------------------------------------------------------------------------

def has_template_access(template: dict, current_user_id=None) -> bool:
    """templateHandler.ts:30-53: self-hosted (no user) sees everything;
    otherwise own templates or published+approved ones."""
    if not current_user_id:
        return True
    if template.get("createdBy") == current_user_id:
        return True
    return (template.get("status") == "published"
            and template.get("reviewStatus") == "approved")


def resolve_price(template: dict, type_: str = "credits",
                  scenario: str = "perCall") -> float:
    """templateHandler.ts:446-455 reslovePrice [sic]: perCall credits when
    finite, positive, and currency matches; else 0."""
    pricing = template.get("pricing") or {}
    per_call = pricing.get("perCall")
    if (scenario == "perCall" and isinstance(per_call, (int, float))
            and not isinstance(per_call, bool) and math.isfinite(per_call)
            and per_call > 0 and pricing.get("currency") == type_):
        return per_call
    return 0


def get_template_options(template, template_type: str,
                         current_user_id=None) -> dict:
    """templateHandler.ts:214-265 getTemplateOptions as a pure function
    (the DB fetch is the caller's seam): access check, type check, and
    the reqOptions extraction (`reqOptions || {}` — always truthy, so the
    not-found branch below it is dead in the reference too)."""
    if not template:
        return {"success": False, "error": "Template not found"}
    if not has_template_access(template, current_user_id):
        return {"success": False,
                "error": "Access denied: You don't have permission to use "
                         "this template"}
    if template.get("templateType") != template_type:
        return {"success": False,
                "error": f"Template type mismatch. Expected: "
                         f"{template_type}, got: "
                         f"{template.get('templateType')}"}
    return {"success": True,
            "template_options": template.get("reqOptions") or {}}


def merge_request_with_template(request_data: dict, template,
                                template_type: str,
                                current_user_id=None) -> dict:
    """templateHandler.ts:314-421 mergeRequestWithTemplate: the full
    request-side pipeline — variable validation/defaults/mapping, option
    merge, domain + keyword restriction enforcement, query/url transforms
    (with original_url preservation), schema-type field filtering."""
    if not (request_data or {}).get("template_id"):
        return dict(request_data)

    result = get_template_options(template, template_type, current_user_id)
    if not result.get("success"):
        raise TemplateExecutionError(
            result.get("error") or "Failed to apply template configuration")
    template_options = result["template_options"]

    merged: dict = dict(request_data)
    provided_vars = merged.get("variables", MISSING)

    errors = validate_variables(template.get("variables"), provided_vars,
                                merged)
    if errors:
        raise TemplateExecutionError(
            "Template variable validation failed:\n- " + "\n- ".join(errors))

    vars_with_defaults = apply_variable_defaults(template.get("variables"),
                                                 provided_vars)
    if vars_with_defaults is not MISSING:
        merged["variables"] = vars_with_defaults
        merged = map_variables_to_request_data(vars_with_defaults, template,
                                               merged)
    elif "variables" in merged:
        del merged["variables"]

    merged_template_data = merge_options_with_template(template_options,
                                                       merged)
    merged = {**merged, **merged_template_data, "template": template}

    metadata = template.get("metadata") or {}
    if merged.get("url") and metadata.get("allowedDomains"):
        restriction = parse_domain_restriction(metadata["allowedDomains"])
        if restriction:
            check = validate_domain(merged["url"], restriction)
            if not check["is_valid"]:
                raise TemplateExecutionError(
                    check.get("error")
                    or "URL not allowed by template domain restrictions")

    if (template_type == "search" and merged.get("query")
            and metadata.get("allowedKeywords")):
        restriction = parse_domain_restriction(metadata["allowedKeywords"])
        if restriction:
            check = validate_pattern(merged["query"], restriction,
                                     "Search query")
            if not check["is_valid"]:
                raise TemplateExecutionError(
                    check.get("error")
                    or "Search query not allowed by template keyword "
                       "restrictions")

    handlers = template.get("customHandlers") or {}
    if (template_type == "search" and merged.get("query")
            and handlers.get("queryTransform")):
        merged["query"] = apply_transform(merged["query"],
                                          handlers["queryTransform"],
                                          "query")

    if merged.get("url") and handlers.get("urlTransform"):
        # original_url is preserved BEFORE the enabled check: even a
        # disabled transform pins it (templateHandler.ts:403-408)
        if not merged.get("original_url"):
            merged["original_url"] = merged["url"]
        merged["url"] = apply_transform(merged["url"],
                                        handlers["urlTransform"], "url")

    if template_type == "search":
        merged.pop("url", None)   # filterBySchemaType (ts:430-444)
    return merged


def process_request(request_data: dict, template, template_type: str,
                    current_user_id=None) -> dict:
    """Merge + the controller-side steps that follow it: drop the embedded
    template before schema validation, then render {{var}} placeholders in
    url (scrape/crawl, filters active) or query (search, filters raw) —
    ScrapeController.ts:86-95, CrawlController.ts:38-47,
    SearchController.ts:55-64. Render errors are swallowed exactly as the
    controllers' try/catch does."""
    merged = merge_request_with_template(request_data, template,
                                         template_type, current_user_id)
    merged.pop("template", None)
    variables = merged.get("variables")
    if template_type == "search":
        if isinstance(merged.get("query"), str):
            merged["query"] = render_text_template(merged["query"], variables)
    elif isinstance(merged.get("url"), str):
        merged["url"] = render_url_template(merged["url"], variables)
    return merged


def make_process_request_udf(template: dict, template_type: str,
                             current_user_id=None):
    """Arrow-batched intake operator: request-JSON column -> processed
    request JSON (sorted keys), or an ``error:`` line when the template
    rejects the request. One template config, compiled once per executor."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def process(requests: pd.Series) -> pd.Series:
        out = []
        for raw in requests:
            if raw is None:
                out.append(None)
                continue
            try:
                processed = process_request(json.loads(raw), template,
                                            template_type, current_user_id)
                out.append(json.dumps(processed, sort_keys=True,
                                      separators=(",", ":"),
                                      ensure_ascii=False))
            except TemplateExecutionError as exc:
                out.append(f"error:{exc}")
        return pd.Series(out)

    return process
