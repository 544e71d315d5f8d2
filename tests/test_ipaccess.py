"""ipUtils.ts parity: client-IP resolution + IP whitelist matching."""
from __future__ import annotations

import random
import re

import pytest

from anycrawl_spark.ipaccess import ip_allowlist

SCHEMA = ("cf_connecting_ip string, x_forwarded_for string, "
          "x_real_ip string, req_ip string, whitelist array<string>")


# --- sequential JS-semantics reference ------------------------------------

def js_parse_int(s):
    if s is None:
        return None
    m = re.match(r"^\s*([+-]?\d+)", s)
    return int(m.group(1)) if m else None


def ip_to_number(ip):
    parts = ip.split(".")
    if len(parts) != 4:
        return None
    num = 0
    for p in parts:
        v = js_parse_int(p)
        if v is None or v < 0 or v > 255:
            return None
        num = num * 256 + v
    return num


def matches_cidr(ip, cidr):
    parts = cidr.split("/")
    network = parts[0] if parts else None
    pstr = parts[1] if len(parts) > 1 else None
    if not network or not pstr:
        return False
    prefix = js_parse_int(pstr)
    if prefix is None or prefix < 0 or prefix > 128:
        return False
    if prefix > 32:
        return False  # 2n ** negative throws; catch -> false
    ipn, netn = ip_to_number(ip), ip_to_number(network)
    if ipn is None or netn is None:
        return False
    host_bits = 32 - prefix
    return (ipn >> host_bits) == (netn >> host_bits)


def ref_client_ip(cf, xff, real, req_ip):
    if cf:
        return cf.strip()
    if xff:
        first = xff.split(",")[0].strip()
        if first:
            return first
    if real:
        return real.strip()
    return req_ip or None


def ref_allowed(ip, whitelist):
    if not whitelist:
        return True
    if not ip:
        return False
    for p in whitelist:
        if ip == p:
            return True
        if "/" in p and matches_cidr(ip, p):
            return True
    return False


# --- pinned quirk cases -----------------------------------------------------

QUIRKS = [
    # whitespace-only CF header returns '' (truthy check precedes trim)
    # and '' is then DENIED even with no... no: empty whitelist allows all.
    (("  ", "9.9.9.9", None, None, ["0.0.0.0/0"]), "", False),
    # XFF empty first hop falls through to X-Real-IP
    ((None, " ,8.8.8.8", "7.7.7.7", None, ["7.7.7.7"]), "7.7.7.7", True),
    # req.ip is NOT trimmed
    ((None, None, None, " 6.6.6.6", ["6.6.6.6"]), " 6.6.6.6", False),
    # no whitelist allows everything, even a missing IP
    ((None, None, None, None, None), None, True),
    ((None, None, None, None, []), None, True),
    # missing IP with a whitelist denies
    ((None, None, None, None, ["1.2.3.4"]), None, False),
    # CIDR basics
    ((None, None, None, "192.168.1.77", ["192.168.1.0/24"]),
     "192.168.1.77", True),
    ((None, None, None, "192.168.2.77", ["192.168.1.0/24"]),
     "192.168.2.77", False),
    # /0 matches everything
    ((None, None, None, "8.8.8.8", ["0.0.0.0/0"]), "8.8.8.8", True),
    # /32 is exact
    ((None, None, None, "10.0.0.1", ["10.0.0.1/32"]), "10.0.0.1", True),
    ((None, None, None, "10.0.0.2", ["10.0.0.1/32"]), "10.0.0.2", False),
    # prefixes 33-128 pass validation but RangeError -> false
    ((None, None, None, "10.0.0.1", ["10.0.0.1/64"]), "10.0.0.1", False),
    # parseInt lenience: "24abc" -> 24; "1e2" -> 1
    ((None, None, None, "192.168.1.9", ["192.168.1.0/24abc"]),
     "192.168.1.9", True),
    ((None, None, None, "1.2.3.4", ["1e2.2.3.4/32"]), "1.2.3.4", True),
    # malformed CIDR pieces
    ((None, None, None, "1.2.3.4", ["/24"]), "1.2.3.4", False),
    ((None, None, None, "1.2.3.4", ["1.2.3.4/"]), "1.2.3.4", False),
    ((None, None, None, "1.2.3.4", ["1.2.3/8"]), "1.2.3.4", False),
    ((None, None, None, "1.2.3.4.5", ["0.0.0.0/0"]), "1.2.3.4.5", False),
    # exact match needs byte equality (no trim on patterns)
    ((None, None, None, "1.2.3.4", [" 1.2.3.4"]), "1.2.3.4", False),
    # CF precedence over everything
    (("5.5.5.5", "4.4.4.4", "3.3.3.3", "2.2.2.2", ["5.5.5.5"]),
     "5.5.5.5", True),
]


class TestIpAccessPinned:
    def test_quirks(self, spark):
        rows = [q[0] for q in QUIRKS]
        out = (ip_allowlist(spark.createDataFrame(rows, SCHEMA))
               .select("client_ip", "allowed").collect())
        for (inp, want_ip, want_allowed), got in zip(QUIRKS, out):
            assert got["client_ip"] == want_ip, \
                f"{inp}: client_ip {got['client_ip']!r} want {want_ip!r}"
            assert got["allowed"] == want_allowed, \
                f"{inp}: allowed {got['allowed']} want {want_allowed}"
        # the reference simulator agrees with every pinned case
        for inp, want_ip, want_allowed in QUIRKS:
            ip = ref_client_ip(*inp[:4])
            assert ip == want_ip
            assert ref_allowed(ip, inp[4]) == want_allowed


class TestIpAccessRandomized:
    def test_matches_reference(self, spark):
        rng = random.Random(42)
        headers = [None, "", " ", "1.2.3.4", " 5.6.7.8 ", "a, b",
                   "10.0.0.1, 10.0.0.2", ",x", "300.1.2.3", "1..2.3"]
        pats = ["1.2.3.4", "10.0.0.0/8", "10.0.0.0/33", "1.2.3.0/24abc",
                "/8", "1.2.3.4/", "abc", "0.0.0.0/0", " 1.2.3.4",
                "255.255.255.255/32", "01.2.3.0/24", "+1.2.3.0/24"]
        rows = []
        for _ in range(300):
            wl = rng.choice([None, [],
                             [rng.choice(pats)],
                             [rng.choice(pats), rng.choice(pats)]])
            rows.append((rng.choice(headers), rng.choice(headers),
                         rng.choice(headers), rng.choice(headers), wl))
        got = (ip_allowlist(spark.createDataFrame(rows, SCHEMA))
               .select("client_ip", "allowed").collect())
        for row, g in zip(rows, got):
            ip = ref_client_ip(*row[:4])
            assert g["client_ip"] == ip, (row, g["client_ip"], ip)
            assert g["allowed"] == ref_allowed(ip, row[4]), (row, ip)
