"""Middleware-chain parity: auth -> IP allowlist -> credits -> deduction."""
from __future__ import annotations


from anycrawl_spark.gateway import auth_gateway

REQ_SCHEMA = ("rid long, method string, path string, authorization string, "
              "cf_connecting_ip string, x_forwarded_for string, "
              "x_real_ip string, req_ip string, resp_status int, "
              "credits_used double, job_id string")
KEY_SCHEMA = ("key string, uuid string, is_active boolean, "
              "allowed_ips array<string>, credits double")

KEYS = [
    ("k-good", "u1", True, None, 100.0),
    ("k-inactive", "u2", False, None, 100.0),
    ("k-iplocked", "u3", True, ["10.0.0.0/8"], 100.0),
    ("k-broke", "u4", True, None, 0.0),
    ("k-negative", "u5", True, None, -5.0),
]


def _req(rid, auth, *, method="POST", path="/v1/scrape", ip="10.1.2.3",
         resp=200, credits=1.0, job="j1"):
    return (rid, method, path, auth, None, None, None, ip, resp, credits,
            job)


class TestAuthGateway:
    def run(self, spark, rows, **kw):
        req = spark.createDataFrame(rows, REQ_SCHEMA)
        keys = spark.createDataFrame(KEYS, KEY_SCHEMA)
        return {r["rid"]: r.asDict()
                for r in auth_gateway(req, keys, **kw).collect()}

    def test_header_chain(self, spark):
        got = self.run(spark, [
            _req(0, None),
            _req(1, ""),
            _req(2, "Token k-good"),
            _req(3, "Bearer"),
            _req(4, "Bearer  k-good"),      # split -> 3 parts
            _req(5, "Bearer k-missing"),
            _req(6, "Bearer k-inactive"),
            _req(7, "Bearer k-good"),
        ])
        assert got[0]["gate_error"] == "No authorization header provided"
        assert got[1]["gate_error"] == "No authorization header provided"
        assert got[2]["gate_error"] == "Invalid authorization header format"
        assert got[3]["gate_error"] == "Invalid authorization header format"
        assert got[4]["gate_error"] == "Invalid authorization header format"
        assert got[5]["gate_error"] == "Invalid API key"
        assert got[6]["gate_error"] == "API key is inactive"
        for rid in range(7):
            assert got[rid]["gate_status"] == 401
            assert got[rid]["api_key_uuid"] is None
            assert got[rid]["should_deduct"] is False
        assert got[7]["gate_status"] is None
        assert got[7]["api_key_uuid"] == "u1"

    def test_ip_allowlist(self, spark):
        got = self.run(spark, [
            _req(0, "Bearer k-iplocked", ip="10.9.9.9"),
            _req(1, "Bearer k-iplocked", ip="11.0.0.1"),
            _req(2, "Bearer k-iplocked", ip=None),
        ])
        assert got[0]["gate_status"] is None
        assert got[1]["gate_status"] == 403
        assert got[1]["gate_error"] == "IP address not allowed"
        assert got[2]["gate_status"] == 403  # missing IP denied (ipUtils:66)

    def test_credit_gate_routes_and_sign(self, spark):
        got = self.run(spark, [
            _req(0, "Bearer k-broke"),
            _req(1, "Bearer k-negative", path="/v1/crawl"),
            # non-billing route: no credit check even with 0 balance
            _req(2, "Bearer k-broke", method="GET", path="/v1/status"),
            _req(3, "Bearer k-broke", path="/v1/other"),
        ])
        assert got[0]["gate_status"] == 402
        assert got[0]["gate_error"] == "Insufficient credits"
        assert got[1]["gate_status"] == 402
        assert got[2]["gate_status"] is None
        assert got[3]["gate_status"] is None

    def test_deduction_decision(self, spark):
        got = self.run(spark, [
            _req(0, "Bearer k-good", path="/v1/crawl"),
            _req(1, "Bearer k-good", path="/v1/scrape"),
            _req(2, "Bearer k-good", resp=500),
            _req(3, "Bearer k-good", credits=0.0),
            _req(4, "Bearer k-good", job=None),
            _req(5, "Bearer k-good", resp=302),
        ])
        assert got[0]["should_deduct"] is True
        assert got[0]["billing_mode"] == "delta"   # crawl create
        assert got[1]["should_deduct"] is True
        assert got[1]["billing_mode"] == "target"
        assert got[2]["should_deduct"] is False    # 5xx
        assert got[3]["should_deduct"] is False    # no credits used
        assert got[4]["should_deduct"] is False    # missing jobId
        assert got[5]["should_deduct"] is True     # 3xx counts (<400)

    def test_disabled_flags(self, spark):
        got = self.run(spark, [_req(0, None)], auth_enabled=False)
        assert got[0]["gate_status"] is None
        got = self.run(spark, [_req(0, "Bearer k-broke")],
                       credits_enabled=False)
        assert got[0]["gate_status"] is None
        assert got[0]["should_deduct"] is False  # deduction needs credits on
