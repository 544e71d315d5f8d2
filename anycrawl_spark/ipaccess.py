"""IP access control (apps/api/src/utils/ipUtils.ts) as JVM expressions.

Two deterministic pieces guard every API request:

* ``getClientIp`` (ipUtils.ts:13-48): header-precedence client-IP
  resolution - CF-Connecting-IP, then the first X-Forwarded-For hop,
  then X-Real-IP, then Express's ``req.ip``.
* ``isIpAllowed`` (ipUtils.ts:59-78) with ``matchesCidr`` /
  ``ipToNumber`` (ipUtils.ts:86-173): exact-or-CIDR whitelist matching
  over IPv4, with JS ``parseInt`` lenience.

Reference quirks reproduced exactly (each is observable behaviour):

* A present-but-whitespace CF header RETURNS the empty string (the
  truthiness check precedes ``.trim()``, ipUtils.ts:17-19) - the chain
  does NOT fall through, and ``isIpAllowed('')`` then denies (''
  is falsy at ipUtils.ts:66).  X-Forwarded-For is asymmetric: an empty
  first hop falls through to X-Real-IP (the ``if (firstIp)`` guards the
  trimmed value, ipUtils.ts:29-32).
* ``req.ip || null``: empty string maps to null, and is NOT trimmed.
* CIDR prefix lengths are validated to [0, 128] (ipUtils.ts:117) but the
  address math is IPv4-only: prefixes 33-128 make ``2n ** negative``
  throw RangeError, which the catch converts to "no match"
  (ipUtils.ts:129-140).
* Octets and prefixes go through JS ``parseInt``: leading whitespace and
  sign accepted, parsing stops at the first non-digit ("24abc" -> 24,
  "1e2" -> 1, "0x1f" -> 0), empty -> NaN -> invalid.
* ``"1.2.3.4"`` must split into exactly four octets, each in [0, 255]
  after parseInt (so "1..2.3" and "1.2.3.4.5" are invalid).

Divergence (documented): values whose leading digit run overflows int64
(e.g. a 20-digit octet) are invalid here via ``try_cast`` where JS would
produce a huge float that fails the <=255 / <=128 range checks anyway -
same verdict, different mechanism.

Everything is whole-stage-codegen (regexp + higher-order array
functions); no UDFs, no shuffle - this filter runs as a map over any
request-log scale.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_JS_INT = r"^\\s*([+-]?[0-9]+)"


def _js_trim(expr: str) -> str:
    """JS String.trim(): full whitespace class, unlike SQL trim()."""
    return f"regexp_replace({expr}, '^\\\\s+|\\\\s+$', '')"


def _js_int(expr: str) -> str:
    """JS parseInt(x, 10) as a BIGINT-or-NULL SQL fragment."""
    digits = f"regexp_extract({expr}, '{_JS_INT}', 1)"
    return (f"CASE WHEN {digits} = '' THEN CAST(NULL AS BIGINT) "
            f"ELSE try_cast({digits} AS BIGINT) END")


def _ip_num(expr: str) -> str:
    """ipToNumber (ipUtils.ts:148-173): exactly four parseInt-able octets
    in [0,255] -> the 32-bit integer; otherwise NULL."""
    parts = f"split({expr}, '\\\\.', -1)"
    octs = f"transform({parts}, p -> {_js_int('p')})"
    return (f"CASE WHEN size({parts}) = 4 AND "
            f"forall({octs}, o -> o IS NOT NULL AND o >= 0 AND o <= 255) "
            f"THEN aggregate({octs}, CAST(0 AS BIGINT), "
            f"(a, o) -> a * 256 + o) END")


def _cidr_match(ip_expr: str, pattern_expr: str) -> str:
    """matchesCidr (ipUtils.ts:105-141).  Network/prefix from the first
    two '/'-separated fields (extra fields ignored, as in JS split);
    empty network or prefix -> false; prefix outside [0,32] -> false
    (33-128 pass the JS validation but then raise in the BigInt mask
    math and the catch returns false).  The subnet compare uses integer
    division by 2^hostBits - identical to masking for non-negative
    32-bit values."""
    sp = f"split({pattern_expr}, '/', -1)"
    net = f"try_element_at({sp}, 1)"
    pstr = f"try_element_at({sp}, 2)"
    shift = "shiftleft(CAST(1 AS BIGINT), CAST(32 - __pfx AS INT))"
    return (
        f"CASE WHEN {net} IS NULL OR {net} = '' "
        f"       OR {pstr} IS NULL OR {pstr} = '' THEN false "
        f"     WHEN __pfx IS NULL OR __pfx < 0 OR __pfx > 32 THEN false "
        f"     WHEN __ipn IS NULL OR __netn IS NULL THEN false "
        f"     ELSE (__ipn DIV {shift}) = (__netn DIV {shift}) "
        f"END").replace("__pfx", f"({_js_int(pstr)})") \
              .replace("__ipn", f"({_ip_num(ip_expr)})") \
              .replace("__netn", f"({_ip_num(net)})")


def client_ip_col(cf: str, xff: str, real_ip: str, req_ip: str) -> Column:
    """getClientIp (ipUtils.ts:13-48) over four header columns."""
    first_hop = f"try_element_at(split({xff}, ','), 1)"
    return F.expr(
        f"CASE WHEN {cf} IS NOT NULL AND {cf} != '' "
        f"       THEN {_js_trim(cf)} "
        f"     WHEN {xff} IS NOT NULL AND {xff} != '' "
        f"          AND {_js_trim(first_hop)} != '' "
        f"       THEN {_js_trim(first_hop)} "
        f"     WHEN {real_ip} IS NOT NULL AND {real_ip} != '' "
        f"       THEN {_js_trim(real_ip)} "
        f"     WHEN {req_ip} IS NOT NULL AND {req_ip} != '' "
        f"       THEN {req_ip} "
        f"END")


def ip_allowed_col(ip: str, whitelist: str) -> Column:
    """isIpAllowed (ipUtils.ts:59-78): no/empty whitelist allows all;
    missing or empty client IP denies; otherwise any pattern matches by
    exact string equality or, when it contains '/', by CIDR."""
    match_one = (f"p = {ip} OR (contains(p, '/') AND "
                 f"{_cidr_match(ip, 'p')})")
    return F.expr(
        f"CASE WHEN {whitelist} IS NULL OR size({whitelist}) = 0 THEN true "
        f"     WHEN {ip} IS NULL OR {ip} = '' THEN false "
        f"     ELSE exists({whitelist}, p -> {match_one}) END")


def ip_allowlist(requests: DataFrame) -> DataFrame:
    """Batch access-control replay: resolve each request's client IP and
    whitelist verdict.  Expects columns ``cf_connecting_ip``,
    ``x_forwarded_for``, ``x_real_ip``, ``req_ip`` (nullable strings) and
    ``whitelist`` (nullable array<string>)."""
    out = requests.withColumn(
        "client_ip",
        client_ip_col("cf_connecting_ip", "x_forwarded_for", "x_real_ip",
                      "req_ip"))
    return out.withColumn("allowed",
                          ip_allowed_col("client_ip", "whitelist"))
