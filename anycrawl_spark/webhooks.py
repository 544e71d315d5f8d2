"""Webhook event pipeline (SURVEY §2 S10): the replayable core of the
reference's WebhookManager — event emission, subscription matching, delivery
record construction, HMAC signing — re-expressed as DataFrame operators.

Reference parity (packages/scrape/src/managers/Webhook.ts):

- ``triggerEvent`` (:88-124): find active subscriptions whose
  ``event_types`` JSON array contains the event type, filtered by scope
  (``all`` or the event source id ∈ ``specific_task_ids``) →
  ``match_deliveries`` as an equi-free conditional join, all JVM
  expressions (arrays_contains), broadcast subscriptions (a dimension
  table: thousands of rows vs billions of events).
- ``enqueueDelivery`` (:126-167): one delivery record per (event,
  subscription) with status='pending', attempt_number=1, max_attempts =
  subscription.max_retries || 3, request_method='POST'.
- ``generateSignature`` (:370-374): ``sha256=<hex HMAC-SHA256(secret,
  JSON.stringify(payload))>`` → ``sign_deliveries``, an Arrow-batched
  pandas UDF over the canonical JSON payload (Spark has no HMAC builtin;
  signing runs once per delivery record, not per crawled page).
- Event catalogue (packages/libs/src/types/WebhookEvents.ts): the
  ``<source>.<created|started|completed|failed|cancelled>`` job families +
  task/monitor/test events.
- The HTTP POST + retry worker (:169-330) is live-infrastructure and out
  of corpus-replay scope; ``deliveries`` is the queue those workers drain.

``job_events_from_summary`` derives the crawl-job lifecycle events
(crawl.created/started/completed|failed|cancelled with totals) from the
engine's run summary / round metas — the batch analogue of Progress.ts
calling triggerEvent at job transitions.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# WebhookEvents.ts WebhookEventType values (verbatim-by-spec constants)
WEBHOOK_EVENT_TYPES = [
    "scrape.created", "scrape.started", "scrape.completed", "scrape.failed",
    "scrape.cancelled",
    "crawl.created", "crawl.started", "crawl.completed", "crawl.failed",
    "crawl.cancelled",
    "search.created", "search.started", "search.completed", "search.failed",
    "map.created", "map.started", "map.completed", "map.failed",
    "task.executed", "task.failed", "task.paused", "task.resumed",
    "monitor.check.completed", "monitor.changed", "monitor.price.changed",
    "monitor.error",
    "webhook.test",
]

SUBSCRIPTION_SCHEMA = (
    "sub_id long, webhook_url string, webhook_secret string, "
    "is_active boolean, event_types array<string>, scope string, "
    "specific_task_ids array<string>, max_retries int"
)

EVENT_SCHEMA = (
    "event_id long, event_type string, event_source string, "
    "event_source_id string, payload string"
)


def match_deliveries(events: DataFrame,
                     subscriptions: DataFrame) -> DataFrame:
    """One pending delivery per (event, matching subscription) —
    Webhook.ts:88-167 semantics: subscription active, event type
    subscribed, and scope 'all' or the event source id listed.

    Subscriptions are a broadcast dimension (the reference loads them all
    per trigger from Postgres); events scale with the crawl, so the join
    must not shuffle the event stream."""
    sub = F.broadcast(
        subscriptions.where(F.col("is_active"))
        .select("sub_id", "webhook_url", "webhook_secret", "event_types",
                "scope", "specific_task_ids", "max_retries"))
    # Webhook.ts:110-116: the scope filter only applies when
    # specificTaskIds is set — `scope !== "all" && specificTaskIds` guards
    # the includes() check, so scope='specific' with NULL task ids still
    # delivers.
    cond = (
        F.array_contains(sub["event_types"], events["event_type"])
        & ((sub["scope"] == "all")
           | sub["specific_task_ids"].isNull()
           | F.array_contains(sub["specific_task_ids"],
                              events["event_source_id"]))
    )
    return (
        events.join(sub, cond)
        .select(
            "event_id", "sub_id", "event_type", "event_source",
            "event_source_id",
            F.col("webhook_url").alias("request_url"),
            F.lit("POST").alias("request_method"),
            F.col("payload").alias("request_body"),
            "webhook_secret",
            F.lit("pending").alias("status"),
            F.lit(1).alias("attempt_number"),
            # JS `maxRetries || 3` (Webhook.ts:144): 0 is falsy, so a
            # subscription with max_retries=0 still gets 3 attempts
            F.when(F.col("max_retries").isNull() | (F.col("max_retries") == 0),
                   F.lit(3)).otherwise(F.col("max_retries"))
            .alias("max_attempts"),
        )
    )


def sign_deliveries(deliveries: DataFrame,
                    body_col: str = "request_body",
                    secret_col: str = "webhook_secret") -> DataFrame:
    """Attach the reference's delivery signature:
    ``sha256=<hex HMAC-SHA256(secret, body)>`` (Webhook.ts:370-374 —
    the body is the already-JSON-stringified payload). Arrow-batched;
    drops the secret column from the output (it never leaves the signer,
    like the reference's header builder)."""

    @F.pandas_udf("string")
    def _sign(body: pd.Series, secret: pd.Series) -> pd.Series:
        # a NULL secret yields a NULL signature — an empty-key HMAC would
        # look signed while being unverifiable, hiding the data problem
        return pd.Series([
            None if s is None else "sha256=" + hmac_mod.new(
                s.encode(), (b or "").encode(), hashlib.sha256).hexdigest()
            for b, s in zip(body, secret)
        ])

    return (deliveries
            .withColumn("signature", _sign(F.col(body_col), F.col(secret_col)))
            .drop(secret_col))


ATTEMPT_SCHEMA = ("delivery_id long, attempt_number int, attempted_at "
                  "timestamp, success boolean, max_attempts int, "
                  "retry_backoff_multiplier int")


def retry_schedule(attempts: DataFrame) -> DataFrame:
    """Fold a delivery-attempt outcome log into each delivery's resulting
    state — the deterministic core of the reference's retry worker
    (Webhook.ts:284-345, ``handleDeliveryFailure``):

    - a successful attempt → status ``delivered`` at that attempt number;
    - a failed attempt with ``attempt_number < max_attempts`` → status
      ``retrying``, ``attempt_number + 1``, and ``next_retry_at =
      attempted_at + pow(retry_backoff_multiplier || 2, attempt_number)
      minutes`` (base 60000 ms, exponent = the attempt that just failed);
    - a failed attempt at ``attempt_number >= max_attempts`` → terminal
      ``failed``, no next retry.

    The HTTP POST that produces each outcome is the live seam; this
    operator replays the recorded outcomes. One hash aggregation per
    delivery — no window, no shuffle beyond the groupBy. Attempts after
    the first success are ignored (they cannot exist in a faithful log;
    replays of merged logs stay idempotent).

    ``next_retry_epoch`` is epoch seconds (bigint) so the result hashes
    identically across engines."""
    a = attempts.select(
        "delivery_id", "attempt_number", "success", "max_attempts",
        F.coalesce("retry_backoff_multiplier", F.lit(2)).alias("mult"),
        F.col("attempted_at").cast("timestamp").cast("long").alias("at_epoch"),
    )
    # The "last failure" fold is max by (attempt_number, at_epoch). Packing
    # the pair into one bigint (attempt << 42 | epoch-seconds) keeps the
    # aggregation buffer primitive, so Spark plans a HashAggregate —
    # max(struct(...)) buffers fall back to a per-partition SortAggregate.
    # Safe while 0 <= at_epoch < 2^42 (year ~141k) and attempt < 2^21.
    packed_fail = F.max(F.when(
        ~F.col("success"),
        F.shiftleft(F.col("attempt_number").cast("long"), 42)
        + F.col("at_epoch")))
    per = a.groupBy("delivery_id").agg(
        F.min(F.when(F.col("success"), F.col("attempt_number")))
        .alias("first_success"),
        F.max("max_attempts").alias("max_attempts"),
        F.max("mult").alias("mult"),
        packed_fail.alias("last_fail_packed"),
    )
    fail_n = F.shiftrightunsigned(F.col("last_fail_packed"), 42).cast("int")
    fail_at = F.col("last_fail_packed") - F.shiftleft(fail_n.cast("long"), 42)
    delivered = F.col("first_success").isNotNull()
    retrying = ~delivered & (fail_n < F.col("max_attempts"))
    backoff_sec = (F.pow(F.col("mult"), fail_n) * 60).cast("long")
    return per.select(
        "delivery_id",
        F.when(delivered, "delivered")
        .when(retrying, "retrying")
        .otherwise("failed").alias("status"),
        F.when(delivered, F.col("first_success"))
        .when(retrying, fail_n + 1)
        .otherwise(fail_n).cast("int").alias("attempt_number"),
        F.when(retrying, fail_at + backoff_sec)
        .cast("long").alias("next_retry_epoch"),
    )


def job_events_from_summary(spark: SparkSession, summary: dict,
                            seed_url: str,
                            created_at: str = "1970-01-01T00:00:00Z",
                            source: str = "crawl") -> DataFrame:
    """Crawl-job lifecycle events from an engine run summary — the batch
    analogue of Progress.ts firing triggerEvent on job transitions.
    Payload field order matches JobEventPayload (WebhookEvents.ts:56-67)
    so the signature input is reproducible."""
    import json

    job_id = summary["job_id"]
    terminal = ("cancelled" if summary.get("cancelled")
                else "failed" if summary.get("done", 0) == 0
                else "completed")

    def payload(status, with_totals):
        body = {"job_id": job_id, "status": status, "url": seed_url}
        if with_totals:
            body["total"] = summary["done"]
            body["completed"] = summary["fetched"]
            body["failed"] = summary["failed"]
        body["created_at"] = created_at
        return json.dumps(body, separators=(",", ":"))

    rows = [
        (0, f"{source}.created", source, job_id, payload("created", False)),
        (1, f"{source}.started", source, job_id, payload("started", False)),
        (2, f"{source}.{terminal}", source, job_id, payload(terminal, True)),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def monitor_events(changes: DataFrame, monitors: DataFrame,
                   change_type_col: str = "change_type",
                   captured_at_col: str = "captured_at") -> DataFrame:
    """Per-change monitor webhook events (MonitorPostProcessor.ts:322-352):
    price_up/price_down changes fire ``monitor.price.changed``, everything
    else ``monitor.changed``; the payload carries the change content inline
    (MonitorEventPayload field order) so consumers act without a callback
    fetch. ``monitors`` is the (monitor_id, monitor_name, monitor_type)
    dimension — broadcast, like the subscription table.

    event_id is a deterministic hash of (monitor_id, url, captured_at) so
    replays produce identical delivery records."""
    etype = F.when(
        F.col(change_type_col).isin("price_up", "price_down"),
        "monitor.price.changed").otherwise("monitor.changed")
    payload = F.to_json(F.struct(
        F.col("monitor_id"), F.col("monitor_name"), F.col("monitor_type"),
        F.col("url"), F.col(change_type_col).alias("change_type"),
        F.col("diff_text"),
        F.col(captured_at_col).cast("string").alias("captured_at"),
    ))
    return (
        changes.join(F.broadcast(monitors), "monitor_id")
        .select(
            F.xxhash64("monitor_id", "url", F.col(captured_at_col).cast("string"))
            .alias("event_id"),
            etype.alias("event_type"),
            F.lit("monitor").alias("event_source"),
            F.col("monitor_id").cast("string").alias("event_source_id"),
            payload.alias("payload"),
        )
    )
