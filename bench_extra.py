"""Round-7 optimization harness (guide §1): per-query noop-sink isolation,
repeats, and .explain("formatted") capture. NOT the driver bench — bench.py
stays frozen; this file exists so before/after numbers and plan diffs in
OPTIMIZATION_r07.md are reproducible.

    python bench_extra.py q1 q2 ...          # time the named registry queries
    python bench_extra.py --all              # the bench.py registry list
    python bench_extra.py --plans q1 ...     # also write plans/r07/<q>_<tag>.txt
    python bench_extra.py --tag before ...   # tag for the plan filenames
    python bench_extra.py --repeats 3 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "tpch_q1_pricing", "tpch_q3_revenue", "perhost_topk",
    "minhash_signature", "lsh_candidate_pairs", "dedup_clusters",
    "dedup_clusters_two_star", "ngram_jaccard_pairs",
    "jaccard_over_candidates", "cosine_over_candidates",
    "simhash_near_pairs", "ann_bruteforce_topk", "ann_ivf_real",
    "gopher_quality", "winnow_fingerprints", "sessionize_events",
    "asof_join_events", "token_count", "windowed_events",
    "media_decode_meta", "auto_engine_decision", "scheduled_runs",
    "webhook_retry_schedule", "credit_rollup", "template_render",
    "execution_finalize", "ledger_rollup", "proxy_select_replay",
    "request_validate", "cache_store_gate", "crawl_results_page",
    "sequence_packing", "span_dedup", "bigram_surprisal",
    "domain_mix_weights", "pretrain_data_pipeline", "semantic_dedup",
    "incremental_dedup",
]


def make_spark(cores: int = CPUS):
    from bench import make_spark as mk
    return mk(cores)


def main() -> None:
    args = sys.argv[1:]
    repeats = 2
    tag = None
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    want_plans = "--plans" in args
    if want_plans:
        args.remove("--plans")
    names = BENCH_QUERIES if "--all" in args else args

    spark = make_spark()
    from anycrawl_spark.operators.queries import REGISTRY

    # warm-up: JVM + python workers (same shape as bench.py's warmup)
    spark.range(1_000_000).selectExpr("bit_xor(xxhash64(id))").collect()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r07:{name}")
        times = []
        for _ in range(repeats):
            t0 = time.time()
            df = REGISTRY[name].fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(f"{name}: {times}", flush=True)
        if want_plans and tag:
            os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            with open(os.path.join(REPO, "plans", "r07",
                                   f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
    spark.sparkContext.setJobDescription(None)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
