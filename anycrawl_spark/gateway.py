"""API gateway replay: auth -> IP allowlist -> credit gate -> deduction
decision (apps/api/src/middlewares).

Every API request runs the same deterministic middleware chain before any
work happens:

* ``authMiddleware`` (AuthMiddleware.ts:6-75): Authorization header
  present (empty string is falsy -> missing), exactly ``Bearer <token>``
  (a JS ``split(" ")`` with any extra space fails the length-2 check),
  key exists, key active, then the per-key IP allowlist via
  getClientIp/isIpAllowed (the ipaccess module).
* ``checkCreditsMiddleware`` (CheckCreditsMiddleware.ts:7-87): only for
  POST /v1/{scrape,crawl,map,search}; credits <= 0 -> 402 (negative
  balances are allowed to exist but not to spend).
* ``deductCreditsMiddleware`` (DeductCreditsMiddleware.ts:30-52): after
  the response, deduct only when the status is 2xx/3xx AND creditsUsed >
  0 AND a jobId exists; billing mode is 'delta' for the crawl-create
  route and 'target' otherwise - exactly the two modes
  ``billing.ledger_rollup`` replays.

The replay is one broadcast join (api_keys is a dimension) plus
row-local expressions - no UDFs, no extra shuffle; it gates any
request-log scale as a map.  Redis/DB effects (the actual deduction
write, retry sleeps) are out of scope; the DECISIONS they act on are
what this operator emits.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from anycrawl_spark.ipaccess import client_ip_col, ip_allowed_col

CREDIT_CHECK_ROUTES = ("/v1/scrape", "/v1/crawl", "/v1/map", "/v1/search")


def auth_gateway(
    requests: DataFrame,
    api_keys: DataFrame,
    *,
    auth_enabled: bool = True,
    credits_enabled: bool = True,
) -> DataFrame:
    """Replay the middleware chain over a request log.

    ``requests`` columns: rid long, method, path, authorization
    (nullable), cf_connecting_ip / x_forwarded_for / x_real_ip / req_ip
    (nullable header strings), resp_status int (the eventual response
    status, for the deduction decision), credits_used double (nullable),
    job_id (nullable).

    ``api_keys`` columns: key string, uuid string, is_active boolean,
    allowed_ips array<string> (nullable), credits double.

    Output per request: gate_status (null = admitted; else 401/402/403),
    gate_error (the exact error string a client sees), api_key_uuid,
    client_ip, should_deduct, billing_mode.
    """
    parts = F.split(F.col("authorization"), " ", -1)
    bearer_ok = (F.size(parts) == 2) & (F.element_at(parts, 1) == "Bearer")
    token = F.when(bearer_ok, F.element_at(parts, 2))

    req = requests.withColumn("__token", token).withColumn(
        "client_ip",
        client_ip_col("cf_connecting_ip", "x_forwarded_for", "x_real_ip",
                      "req_ip"))
    keys = api_keys.select(
        F.col("key").alias("__k_key"), F.col("uuid").alias("__k_uuid"),
        F.col("is_active").alias("__k_active"),
        F.col("allowed_ips").alias("__k_ips"),
        F.col("credits").alias("__k_credits"))
    req = req.join(F.broadcast(keys),
                   F.col("__token") == F.col("__k_key"), "left")

    ip_ok = ip_allowed_col("client_ip", "__k_ips")
    needs_credit_check = (F.col("method") == "POST") \
        & F.col("path").isin(*CREDIT_CHECK_ROUTES)

    no_header = F.col("authorization").isNull() \
        | (F.col("authorization") == "")
    if auth_enabled:
        gate_error = (
            F.when(no_header, F.lit("No authorization header provided"))
            .when(~F.coalesce(bearer_ok, F.lit(False)),
                  F.lit("Invalid authorization header format"))
            .when(F.col("__k_uuid").isNull(), F.lit("Invalid API key"))
            .when(~F.col("__k_active"), F.lit("API key is inactive"))
            .when((F.size(F.coalesce(F.col("__k_ips"),
                                     F.array().cast("array<string>"))) > 0)
                  & ~ip_ok, F.lit("IP address not allowed"))
        )
        if credits_enabled:
            gate_error = gate_error.when(
                needs_credit_check & (F.col("__k_credits") <= 0),
                F.lit("Insufficient credits"))
        gate_status = (
            F.when(gate_error.isNull(), F.lit(None).cast("int"))
            .when(gate_error == "IP address not allowed", F.lit(403))
            .when(gate_error == "Insufficient credits", F.lit(402))
            .otherwise(F.lit(401)))
    else:
        gate_error = F.lit(None).cast("string")
        gate_status = F.lit(None).cast("int")

    admitted = gate_status.isNull()
    resp = F.coalesce(F.col("resp_status"), F.lit(-1))
    should_deduct = (
        admitted & F.lit(credits_enabled and auth_enabled)
        & (resp >= 200) & (resp < 400)
        & (F.coalesce(F.col("credits_used"), F.lit(0.0)) > 0)
        & F.col("job_id").isNotNull() & (F.col("job_id") != ""))
    billing_mode = F.when(
        should_deduct,
        F.when((F.col("method") == "POST") & (F.col("path") == "/v1/crawl"),
               F.lit("delta")).otherwise(F.lit("target")))

    return req.select(
        "rid", "method", "path", "client_ip",
        gate_status.alias("gate_status"),
        gate_error.alias("gate_error"),
        F.when(admitted, F.col("__k_uuid")).alias("api_key_uuid"),
        should_deduct.alias("should_deduct"),
        billing_mode.alias("billing_mode"),
    )
