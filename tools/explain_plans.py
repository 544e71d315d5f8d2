"""Dump executed-plan evidence for the key dataflows into PLANS.md:
predicate pushdown into parquet scans, column pruning (ReadSchema), broadcast
joins for small dims, whole-stage codegen spans, and the single
ArrowEvalPython node for extraction. Run: python tools/explain_plans.py
"""

from __future__ import annotations

import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    out = io.StringIO()
    import contextlib

    with contextlib.redirect_stdout(out):
        df.explain("formatted")
    return out.getvalue()


def plan_of_executed(df) -> str:
    """Formatted explain AFTER executing the Dataset's own query: AQE
    re-optimizes at runtime, so queries wrapped in AdaptiveSparkPlan
    (anything with an exchange — including the r7 width-spread
    repartitions) only show codegen ids and final join strategies in the
    FINAL plan, like the UI's SQL tab. collect() (not a separate write,
    which would spawn its own QueryExecution) finalizes this plan."""
    df.collect()
    return plan_of(df)


def plan_without_checkpoints(fn, *args) -> str:
    """Capture the full logical pipeline of a query whose implementation
    localCheckpoints reused subtrees (r7: semantic_dedup, proxy replay):
    the materialization barrier truncates lineage to a LogicalRDD, which
    HIDES the upstream joins/windows this file asserts on. Stubbing
    localCheckpoint to identity yields the un-truncated plan — the same
    operators, minus the evaluate-once barriers. (Spark 4: the concrete
    implementation lives on the classic DataFrame class.)"""
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    orig = _DF.localCheckpoint
    _DF.localCheckpoint = lambda self, eager=True: self
    try:
        return plan_of(fn(*args))
    finally:
        _DF.localCheckpoint = orig


def summarize(name: str, plan: str, checks: dict[str, str]) -> str:
    lines = [f"### {name}\n"]
    for label, pattern in checks.items():
        hit = re.search(pattern, plan)
        lines.append(f"- {'✅' if hit else '❌'} {label}"
                     + (f" — `{hit.group(0)[:110]}`" if hit else ""))
    return "\n".join(lines) + "\n"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false").getOrCreate())
    from anycrawl_spark.corpus import generate_pages, generate_robots
    from anycrawl_spark.crawl import _canonical_cols, prepare_corpus
    from anycrawl_spark.operators.queries import REGISTRY
    from anycrawl_spark.politeness import apply_host_budget, robots_allowed
    from anycrawl_spark.udfs import make_extract_udf

    corpus_dir = os.path.join(REPO, ".bench_cache", "pages_2000")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        generate_pages(spark, 2000, num_hosts=8).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    sections = []

    # 1. corpus scan with host filter: pushdown + pruning
    host_scan = pages.where(F.col("lang") == "en").select("url", "lang")
    p = plan_of(host_scan)
    sections.append((
        "Corpus scan: filter pushdown + column pruning",
        p,
        {
            "filter pushed to parquet scan": r"PushedFilters: \[.*(IsNotNull|EqualTo)\(lang",
            "only url/lang read (html pruned)": r"ReadSchema: [^\n]*url[^\n]*lang",
            "whole-stage codegen": r"codegen id",
        },
    ))

    # 2. fetch join + extraction
    corpus = prepare_corpus(pages)
    frontier = _canonical_cols(pages.select("url"), "url")
    extract = make_extract_udf(formats=("markdown", "text", "links"))
    fetchx = (
        frontier.join(corpus, frontier["url_hash"] == corpus["page_url_hash"], "left")
        .withColumn("doc", extract(F.col("url"), F.col("html")))
        .select("url", F.col("doc.markdown").alias("markdown"))
    )
    p = plan_of(fetchx)
    sections.append((
        "Fetch join + extraction UDF",
        p,
        {
            "single ArrowEvalPython (UDF evaluated once)": r"ArrowEvalPython",
            "frontier side reads only url": r"ReadSchema: struct<url:string>",
            "equi-join on url_hash (SMJ at scale; broadcast on tiny fixtures)": r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
            "AQE active": r"AdaptiveSparkPlan",
        },
    ))
    simple = fetchx._jdf.queryExecution().executedPlan().toString()
    assert simple.count("ArrowEvalPython") == 1, "extraction UDF must appear exactly once"

    # 3. robots broadcast join
    robots = generate_robots(spark, num_hosts=8)
    cand = _canonical_cols(pages.select("url"), "url")
    allowed = robots_allowed(cand, robots)
    p = plan_of(allowed)
    sections.append((
        "Robots enforcement",
        p,
        {
            "robots side broadcast (no shuffle of candidates)": r"BroadcastHashJoin",
            "broadcast exchange of the tiny robots table": r"BroadcastExchange",
        },
    ))

    # 4. per-host budget window
    admitted, _ = apply_host_budget(
        cand.withColumn("depth", F.lit(0)).withColumn("seq", F.lit(0)), 4)
    p = plan_of(admitted)
    sections.append((
        "Per-host politeness budget",
        p,
        {
            "single shuffle keyed by host": r"hashpartitioning\(host",
            "running row_number window": r"RunningWindowFunction|Window",
        },
    ))

    # 5. TPC-H q3: broadcast of the filtered dim
    q3 = REGISTRY["tpch_q3_revenue"].fn(spark, "/root/testdata/sf0.01")
    p = plan_of(q3)
    sections.append((
        "tpch_q3_revenue: selective dim broadcast + top-k",
        p,
        {
            "customer dim broadcast": r"BroadcastHashJoin",
            "mktsegment filter pushed to scan": r"PushedFilters: \[.*c_mktsegment",
            "TakeOrderedAndProject for the top-k": r"TakeOrderedAndProject",
        },
    ))

    # 6. simhash near-pairs: banded equi-join, not a cartesian pair join
    snp = REGISTRY["simhash_near_pairs"].fn(spark, "/root/testdata/sf0.01")
    p = plan_of(snp)
    sections.append((
        "simhash_near_pairs: pigeonhole band blocking",
        p,
        {
            "pair join is a hash join on (band_idx, band_val)":
                r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*\n[^\n]*band",
            "band keys present in join": r"band_idx",
            "signature subtree materialized once (localCheckpoint scan; the "
            "16-row bit-dimension cross join runs once, not per join side)":
                r"Scan ExistingRDD",
        },
    ))
    # the pair join itself must be a hash join keyed on the bands; the
    # checkpointed signature scan keeps the bit-dimension cross join out of
    # the self-join entirely
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
                     r"[^\n]*\n[^\n]*band", p), "band join must be hash-keyed"
    for line in p.splitlines():
        if "NestedLoopJoin" in line and "doc_id" in line:
            raise AssertionError("pair join fell back to a nested loop")

    # 7. ANN top-k: TakeOrderedAndProject, no unpartitioned global window
    ann = REGISTRY["ann_bruteforce_topk"].fn(spark, "/root/testdata/sf0.01")
    p = plan_of(ann)
    sections.append((
        "ann_bruteforce_topk: global top-k without a global window",
        p,
        {
            "TakeOrderedAndProject (per-partition top-k + driver merge)":
                r"TakeOrderedAndProject",
        },
    ))
    assert "Window" not in p, "ANN top-k must not plan any window"
    sections.append((
        "ann_bruteforce_topk: no window operator at all",
        "(see previous section's plan)",
        {},
    ))

    # 8. IVF probe: partition-pruned inverted-list scan
    import tempfile

    import numpy as np

    from anycrawl_spark.operators.ann import (
        build_ivf_index, ivf_topk, train_centroids)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cent = train_centroids(emb, k=16, iters=8)
    ivf_dir = tempfile.mkdtemp(prefix="plans_ivf_")
    build_ivf_index(emb.where(F.col("vec_id") != 0), ivf_dir, cent)
    qv = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    p = plan_of(ivf_topk(spark, ivf_dir, cent, qv, k=10, nprobe=4))
    sections.append((
        "ann_ivf_real: multi-probe reads only probed cells",
        p,
        {
            "partition filter on probed cells": r"PartitionFilters: \[cell",
            "top-k via TakeOrderedAndProject": r"TakeOrderedAndProject",
        },
    ))

    # 9. as-of join: one keyed window, no range-join nested loop
    p = plan_of(REGISTRY["asof_join_events"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "asof_join_events: union + keyed window, no pair explosion",
        p,
        {
            "single keyed window carries the right row forward":
                r"last\(",
            "shuffle keyed by the join key": r"hashpartitioning\(user_id",
        },
    ))
    assert "NestedLoop" not in p, "as-of join must not plan a nested loop"

    # 9b. webhook match: broadcast dimension, event stream un-shuffled
    p = plan_of(REGISTRY["webhook_match"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "webhook_match: broadcast-dim conditional join (S10)",
        p,
        {
            "subscriptions broadcast (non-equi array_contains condition)":
                r"BroadcastNestedLoopJoin",
            "no cartesian product": r"^(?!.*CartesianProduct)",
        },
    ))
    assert "CartesianProduct" not in p, "webhook match must broadcast, not cartesian"

    # 10. interval join: bucket-expanded equi-join
    p = plan_of(REGISTRY["range_join_events"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "range_join_events: bucket-expanded interval join",
        p,
        {
            "equi-join on the time bucket (hash join)":
                r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
            "interval explode into overlapped buckets": r"Generate",
        },
    ))
    assert "NestedLoop" not in p, "interval join must not plan a nested loop"

    # 11. jaccard over LSH candidates: every join is a keyed equi-join on
    # band_hash or doc ids — no block self-join, no nested loop anywhere
    p = plan_of(REGISTRY["jaccard_over_candidates"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "jaccard_over_candidates: candidate-bounded scoring (100-TB dedup path)",
        p,
        {
            "candidate generation is a band_hash equi-join":
                r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*\n[^\n]*band_hash",
            "scoring joins keyed on doc ids": r"doc_a",
        },
    ))
    assert "NestedLoop" not in p, "candidate scoring must not nested-loop"
    assert "len_bucket" not in p, "no (lang, len-bucket) block join in the scale path"

    # 12. cosine over WTA-band candidates: same shape for embeddings
    p = plan_of(REGISTRY["cosine_over_candidates"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "cosine_over_candidates: banded candidates, no label block join",
        p,
        {
            "candidate generation is a band equi-join": r"band_val",
            "scoring joins keyed on vec ids": r"vec_a",
        },
    ))
    assert "NestedLoop" not in p, "cosine candidate scoring must not nested-loop"
    assert not re.search(r"Join[^\n]*label", p), "no label block join in the scale path"

    # 13. auto-engine decision: pure JVM expression tree, zero Python
    p = plan_of_executed(
        REGISTRY["auto_engine_decision"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "auto_engine_decision: JS-requirement scoring stays JVM-side",
        p,
        {
            "whole-stage codegen": r"codegen id",
            "only doc_id/text read from parquet": r"ReadSchema: [^\n]*doc_id[^\n]*text",
        },
    ))
    assert "EvalPython" not in p, "auto-engine scoring must not call Python"

    # 14. media decode: two Arrow-batched mapInPandas stages (synthesize,
    # decode), repartitioned by id so payload sizes spread evenly
    p = plan_of(REGISTRY["media_decode_meta"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "media_decode_meta: Arrow-batched decode stages",
        p,
        {
            "mapInPandas stages present": r"MapInPandas",
            "payload spread by id hash": r"hashpartitioning\((media_id|doc_id)",
        },
    ))

    # 15. scheduler cron fan-out: task dim broadcast onto day chunks, one
    # Arrow-batched MapInPandas expansion, one exchange for the DST
    # fire-once groupBy
    p = plan_of(REGISTRY["scheduled_runs"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "scheduled_runs: broadcast task-dim × day-chunk cron fan-out",
        p,
        {
            "task dimension broadcast onto the chunk range":
                r"BroadcastExchange",
            "single Arrow-batched cron expansion": r"MapInPandas",
            "fire-once dedup is a keyed hash agg (epoch-millis min buffer)":
                r"HashAggregate",
        },
    ))
    assert len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1, \
        "cron expansion must run once"
    assert "ArrowEvalPython" not in p, "no per-row Python in the scheduler"
    assert "SortAggregate" not in p, \
        "fire-once min must hash-aggregate (primitive buffers only)"

    # 16. webhook retry ladder: Generate explodes the attempt ladder, all
    # backoff math stays JVM-side
    p = plan_of(REGISTRY["webhook_retry_schedule"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "webhook_retry_schedule: JVM-side attempt-ladder replay",
        p,
        {
            "attempt ladder exploded via Generate": r"Generate",
            "per-delivery fold is a hash agg (packed-long fail buffer, "
            "no SortAggregate)": r"HashAggregate[^\n]*\n[^\n]*delivery_id",
            "backoff math inline in JVM expressions": r"POWER\(",
        },
    ))
    assert "EvalPython" not in p and "MapInPandas" not in p, \
        "retry ladder math must stay JVM-side"
    assert "SortAggregate" not in p, \
        "retry fold must hash-aggregate (primitive buffers only)"

    # 17. credit rollup: two keyed hash aggs (idempotency dedup, job
    # rollup), each with a map-side partial — no Python, no window
    p = plan_of(REGISTRY["credit_rollup"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "credit_rollup: partial-agg idempotency dedup + job rollup",
        p,
        {
            "map-side partial aggregation before each exchange":
                r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
            "dedup keyed by the (job_id, done) idempotency pair":
                r"hashpartitioning\(job_id[^\n]*done",
        },
    ))
    assert "EvalPython" not in p, "credit math must stay JVM-side"
    assert "Window" not in p, "credit rollup must not plan a window"
    assert "SortAggregate" not in p, \
        "idempotency dedup must hash-aggregate (primitive buffers only)"

    # 18. markdown parity: the extraction kernel runs exactly once
    # (ArrowEvalPython), goldens joined by broadcast, mismatch count is a
    # hash agg
    p = plan_of(REGISTRY["extraction_markdown_parity"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "extraction_markdown_parity: single kernel pass vs JVM golden",
        p,
        {
            "extraction kernel evaluated once": r"ArrowEvalPython",
            "golden joined without shuffling the corpus": r"BroadcastHashJoin",
            "mismatch rollup is a hash agg": r"HashAggregate",
        },
    ))
    assert len(re.findall(r"^\(\d+\) ArrowEvalPython", p, re.M)) == 1, \
        "markdown parity must evaluate the kernel exactly once"

    # 19. cuckoo seen-filter: segment table broadcast onto candidates, one
    # Arrow-batched membership test, then ONE anti-join whose residual
    # condition exempts probe-negative rows (r6: replaced the split+union,
    # which re-evaluated the candidate subtree once per branch; same plan
    # contract as the bloom family)
    p = plan_of(REGISTRY["cuckoo_seen_filter"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "cuckoo_seen_filter: broadcast segments + Arrow membership test",
        p,
        {
            "segments broadcast (candidates never shuffle for the test)":
                r"BroadcastHashJoin",
            "one Arrow-batched membership probe": r"MapInPandas",
            "maybe-seen remainder pays the exact anti-join": r"LeftAnti",
        },
    ))

    # 20. billing charge details: items built/filtered/totaled as array
    # expressions — no shuffle at all (explode is the only row expansion)
    p = plan_of(REGISTRY["billing_charge_details"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "billing_charge_details: shuffle-free itemized charge math",
        p,
        {
            "item explode via Generate": r"\(\d+\) Generate",
            "whole-stage codegen around the array math": r"codegen id",
        },
    ))
    assert "Exchange" not in p, "charge itemization must not shuffle"
    assert "EvalPython" not in p, "credit math must stay JVM-side"

    # 21. scheduler stale-execution sweep: dims broadcast, the four case
    # unions stay shuffle-free scans
    p = plan_of(REGISTRY["stale_executions"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "stale_executions: broadcast task/job dims onto the execution scan",
        p,
        {
            "task + job dims broadcast (executions never shuffle)":
                r"BroadcastHashJoin",
            "case unions": r"Union",
        },
    ))
    assert "Exchange hashpartitioning" not in p, \
        "sweep must not shuffle the executions table"

    # 22. subscription auto-pause: one window shuffle keyed by user, the
    # over-quota groups broadcast back
    p = plan_of(REGISTRY["subscription_excess_tasks"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "subscription_excess_tasks: keyed age-rank window + broadcast quota",
        p,
        {
            "per-user age rank window": r"Window",
            "rank shuffle keyed by user_id": r"hashpartitioning\(user_id",
            "over-quota groups broadcast onto the ranked tasks":
                r"BroadcastHashJoin",
        },
    ))

    # 23. template render pipeline: one Arrow-batched UDF over the
    # documents scan — request synthesis, merge, and render are all
    # row-local, so the whole query is shuffle-free
    p = plan_of(REGISTRY["template_render"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "template_render: one Arrow UDF, shuffle-free row-local pipeline",
        p,
        {
            "one Arrow-batched process_request UDF": r"ArrowEvalPython",
        },
    ))
    assert "Exchange hashpartitioning" not in p, \
        "template render must not shuffle"
    assert len(re.findall(r"^\(\d+\) ArrowEvalPython", p, re.M)) == 1, \
        "template render must evaluate the pipeline exactly once"

    # 24. execution finalize: winner resolution = row_number windows keyed
    # by execution_uuid; the (large) call log is never broadcast
    p = plan_of(REGISTRY["execution_finalize"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "execution_finalize: first-call-wins windows keyed by execution",
        p,
        {
            "winner windows keyed by execution_uuid":
                r"hashpartitioning\(execution_uuid",
            "row_number picks the first finalize call": r"row_number",
        },
    ))
    assert "EvalPython" not in p, "finalize replay must stay JVM-side"

    # 25. billing ledger: per-job sequential fold via applyInPandas (jobs
    # fold in parallel), dims broadcast, one keyed balance window
    p = plan_of(REGISTRY["ledger_rollup"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "ledger_rollup: per-job fold + broadcast dims + keyed balance window",
        p,
        {
            "per-job sequential fold (parallel across jobs)":
                r"FlatMapGroupsInPandas",
            "jobs/api_keys dims broadcast": r"BroadcastHashJoin",
            "balance snapshots via one window keyed by api_key":
                r"hashpartitioning\(api_key",
        },
    ))

    # 26. proxy domain-cache fold: one keyed window + one hash aggregate
    # per domain — no Python, no sequential state
    p = plan_of(REGISTRY["proxy_cache_replay"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "proxy_cache_replay: one exchange — aggregate reuses the window "
        "partitioning",
        p,
        {
            "last-success window keyed by domain":
                r"hashpartitioning\(domain",
            "conditional aggregation (max_by is typed-imperative, so "
            "SortAggregate)": r"SortAggregate",
        },
    ))
    assert "EvalPython" not in p, "cache fold must stay JVM-side"
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1, \
        "cache fold must shuffle exactly once (window + agg share it)"

    # 27. ip allowlist: pure row-local expressions — zero exchanges,
    # zero UDFs over any request-log scale
    p = plan_of(REGISTRY["ip_allowlist"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "ip_allowlist: shuffle-free JVM map over the request log",
        p,
        {
            "whole-stage codegen project": r"Project",
        },
    ))
    assert "Exchange hashpartitioning" not in p, \
        "ip allowlist must not shuffle"
    assert "EvalPython" not in p, "ip allowlist must stay JVM-side"

    # 28. proxy select replay: rules/cache/failure dims broadcast; the
    # only hash exchanges are the rule-pick window and the rotation
    # counter's range buckets (both keyed)
    p = plan_without_checkpoints(REGISTRY["proxy_select_replay"].fn,
                                 spark, "/root/testdata/sf0.01")
    sections.append((
        "proxy_select_replay: rule CASE chain + broadcast dims + keyed "
        "rotation buckets",
        p,
        {
            # real callers pass dim DataFrames → BroadcastHashJoin; the
            # registry query's one-row literal dims constant-fold the
            # equi-key, so Catalyst plans the (optimal) one-row
            # broadcast nested loop instead
            "cache/failure dims broadcast":
                r"Broadcast(Hash|NestedLoop)Join",
            "rotation cumsum keyed by range bucket":
                r"hashpartitioning\(__bkt",
        },
    ))
    assert "EvalPython" not in p, "selection replay must stay JVM-side"
    assert not re.search(r"hashpartitioning\(seq", p), \
        "rule matching must be the row-local CASE chain, not a per-seq " \
        "window"

    # 29. auth gateway: one broadcast dim join, otherwise row-local —
    # no hash exchange at any request-log scale
    p = plan_of(REGISTRY["auth_gateway"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "auth_gateway: broadcast api-key dim + row-local middleware chain",
        p,
        {
            "api_keys broadcast": r"BroadcastHashJoin",
        },
    ))
    assert "Exchange hashpartitioning" not in p, \
        "gateway must not shuffle the request log"
    assert "EvalPython" not in p, "gateway must stay JVM-side"

    # 30. zod intake gate: one Arrow-batched MapInPandas over the request
    # scan, shuffle-free
    p = plan_of(REGISTRY["request_validate"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "request_validate: one Arrow MapInPandas, shuffle-free",
        p,
        {
            "Arrow-batched parse": r"MapInPandas",
        },
    ))
    assert "Exchange hashpartitioning" not in p, \
        "intake gate must not shuffle"
    assert len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1, \
        "intake gate must parse exactly once"

    # 31. controller results-page replay: the per-job ranking window is
    # keyed (one shared ranking serves every request), dims broadcast,
    # everything JVM-side
    p = plan_of(REGISTRY["crawl_results_page"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "crawl_results_page: keyed per-job ranking window + broadcast "
        "dims, JVM-only",
        p,
        {
            "results ranked per job (keyed window)":
                r"hashpartitioning\(job_id",
            "jobs/counts dims broadcast": r"BroadcastHashJoin",
        },
    ))
    assert "EvalPython" not in p, "results page must stay JVM-side"
    assert not re.search(r"Window.*\n.*partitionBy: \[\]", p), \
        "results ranking must be a keyed window"

    # 32. executions listing: ranking keyed by task, page bounds applied
    # as join residual (no second pass), jobs dim broadcast
    p = plan_of(REGISTRY["task_executions_page"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "task_executions_page: keyed per-task ranking + page bounds as "
        "join residual",
        p,
        {
            "executions ranked per task (keyed window)":
                r"hashpartitioning\(scheduled_task_uuid",
            "jobs dim broadcast": r"BroadcastHashJoin",
        },
    ))
    assert "EvalPython" not in p, "executions page must stay JVM-side"

    # 30. cache write gate + key derivation: pure JVM expression chains
    p = plan_of_executed(
        REGISTRY["cache_store_gate"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "cache_store_gate: write-side admission + key derivation stays "
        "in codegen",
        p,
        {
            "parquet scan prunes to (doc_id, text)":
                r"ReadSchema: struct<doc_id:bigint,text:string",
            "scan + synthesis codegen (the higher-order query-sort "
            "lambdas eval JVM-interpreted — Spark can't codegen "
            "lambdafunction — but never leave the JVM)": r"codegen id",
        },
    ))
    assert "EvalPython" not in p, "cache gate must stay JVM-side"
    # row-local: no KEYED shuffle. (A round-robin repartition exchange is
    # the deliberate r7 width-spread of the single-file driver table —
    # it moves no rows to any particular key.)
    assert "Exchange hashpartitioning" not in p, \
        "cache gate is row-local (no keyed shuffle)"

    # 31. screenshot readiness hint: ONE shuffle — the aggregation reuses
    # the window's hashpartitioning(domain)
    p = plan_of(REGISTRY["screenshot_ready_hint"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "screenshot_ready_hint: keyed window + same-key agg share one "
        "exchange",
        p,
        {
            "keyed window (no unpartitioned WindowExec)":
                r"hashpartitioning\(domain",
            "hash aggregation (no sort-based fallback)": r"HashAggregate",
        },
    ))
    assert "EvalPython" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, \
        "agg must reuse the window's single domain exchange"

    # 32. span_dedup: the winner rule is a pure BIGINT min over doc_id —
    # genuinely hash-aggregable (min over a STRUCT silently falls back
    # to SortAggregate, a per-task sort of the whole occurrence
    # stream), so partial aggregation combines map-side and neither a
    # sorted window nor ANY sort-based aggregate exists in the plan
    p = plan_of(REGISTRY["span_dedup"].fn(spark, "/root/testdata/sf0.01"))
    sections.append((
        "span_dedup: BIGINT doc_id winner min, hash-aggregated only",
        p,
        {
            "winner aggregation keyed by span hash":
                r"hashpartitioning\(h",
            "parquet scan prunes to (doc_id, text)":
                r"ReadSchema: struct<doc_id:bigint,text:string",
            "hash aggregation (partial combine map-side)":
                r"HashAggregate",
        },
    ))
    assert "EvalPython" not in p, "span_dedup must stay JVM-side"
    assert not re.search(r"\(\d+\) Window", p), \
        "winner rule must be an aggregation, never a per-key sorted window"
    assert "SortAggregate" not in p, \
        "winner min must stay hash-aggregable (pure BIGINT doc_id min, " \
        "not a struct min)"
    assert len(re.findall(r"Generate explode", p)) <= 1, \
        "the explode+md5 subtree must be evaluated once (winners branch)"

    # 33. bigram_surprisal: every join (unigram context onto the bigram
    # counts, and the single occurrence join) is UNHINTED — AQE may
    # upgrade them to broadcast at runtime when stats fit, but no plan
    # may force a driver-side broadcast of vocabulary-sized tables. The
    # check is scale-aware (r6 VERDICT item 1): auto-broadcast is
    # disabled while capturing, so at sf-small the plan shows the same
    # shuffle joins it would at corpus scale — and because a broadcast()
    # HINT would survive the disabled threshold, the absence of any
    # BroadcastHashJoin here also proves the joins are hint-free.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(REGISTRY["bigram_surprisal"].fn(
            spark, "/root/testdata/sf0.01"))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    sections.append((
        "bigram_surprisal: hint-free keyed equi-joins (auto-broadcast "
        "disabled for capture — broadcast appearing here would mean a "
        "forced hint)",
        p,
        {
            "count/occurrence joins are keyed shuffle equi-joins":
                r"(SortMergeJoin|ShuffledHashJoin)",
            "hash aggregation (train + score passes)": r"HashAggregate",
        },
    ))
    assert "BroadcastHashJoin" not in p, \
        "bigram joins must be hint-free (broadcast with threshold -1 " \
        "implies a forced hint)"
    assert "EvalPython" not in p, "bigram_surprisal must stay JVM-side"

    # 34. domain_mix_weights: totals broadcast over the group table
    p = plan_of(REGISTRY["domain_mix_weights"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "domain_mix_weights: group agg + broadcast totals",
        p,
        {
            "totals join is a broadcast nested loop over 1 row":
                r"BroadcastNestedLoopJoin",
            "hash aggregation to the group grain": r"HashAggregate",
        },
    ))
    assert "EvalPython" not in p, "mix weights must stay JVM-side"

    # 35. pretrain_data_pipeline: the capstone composition's shuffle
    # inventory matches its docstring — fingerprint window, shingle
    # equi-join, anti-join, shard window; all windows keyed
    p = plan_of(REGISTRY["pretrain_data_pipeline"].fn(
        spark, "/root/testdata/sf0.01"))
    sections.append((
        "pretrain_data_pipeline: composed prep chain, keyed windows only",
        p,
        {
            "dedup window keyed by fingerprint": r"hashpartitioning\(fp",
            "packing window keyed by shard": r"hashpartitioning\(shard",
            "decontamination is a LeftAnti hash join": r"LeftAnti",
            "parquet scan prunes to (doc_id, text, lang)":
                r"ReadSchema: struct<doc_id:bigint,text:string,"
                r"lang:string",
        },
    ))
    assert "EvalPython" not in p, "prep chain must stay JVM-side"

    # 36. semantic_dedup: medoid table broadcast, assignment window keyed
    # by vec_id, within-cluster pair join is an equi-join on the cluster
    # key — never a cartesian product
    p = plan_without_checkpoints(REGISTRY["semantic_dedup"].fn,
                                 spark, "/root/testdata/sf0.01")
    sections.append((
        "semantic_dedup: broadcast medoids, cluster-keyed pair join",
        p,
        {
            "assignment window keyed by vec_id":
                r"hashpartitioning\(vec_id",
            "8-row medoid table broadcast": r"BroadcastNestedLoopJoin",
        },
    ))
    assert "EvalPython" not in p, "semantic dedup must stay JVM-side"
    assert "CartesianProduct" not in p, \
        "within-cluster pairs must equi-join on the cluster key"

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("# PLANS — physical-plan evidence (auto-generated by "
                "tools/explain_plans.py)\n\n"
                "Checks below grep the `explain(\"formatted\")` output of each "
                "dataflow; full plans in the collapsible blocks.\n\n")
        for name, plan, checks in sections:
            f.write(summarize(name, plan, checks))
            f.write("\n<details><summary>full plan</summary>\n\n```\n")
            f.write(plan[:6000])
            f.write("\n```\n</details>\n\n")
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
