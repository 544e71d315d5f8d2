"""The crawl engine: frontier + fetch-join + extraction rounds on Spark
(SURVEY.md §3.2 — the flagship path, re-expressed as batch micro-iterations).

Each round r is one Spark batch over immutable checkpointed state:

    pending_r  →  per-host budget window (politeness shuffle by host)
               →  fetch = broadcast-free equi-join against the pages corpus
                  on url_hash (partition-prunable at scale)
               →  vectorized extraction UDF (T1-T20)
               →  results_r append (scrape_paths-gated persistence)
               →  posexplode(links) → canonicalize (JVM expr) → strategy /
                  path / depth / robots filters → in-batch dedup
               →  Bloom pre-filter + exact anti-join vs seen set
               →  enqueue-cap top-k → seq assignment → pending_{r+1}
               →  seen segment, progress, per-partition lineage appended;
                  manifest commit (atomic) → resumable

Dedup semantics follow the reference's queue path (crawlee uniqueKey dedup at
enqueue time, ``Base.ts:464-493``): the seen set is "everything ever
enqueued", and ``limit`` caps total enqueued URLs (coordinator admission
``completed+failed+pending >= limit``, ``crawlCoordinator.ts:106-113``).
Visit order is the coordinator's FIFO-BFS: children are appended in
(parent seq, link position) order, reproduced by the dense ``seq``
assignment (SURVEY.md §7.4 hard-part 2/3).

INTENTIONAL DIVERGENCE from ``crawlCoordinator.ts``: the coordinator dedups
on RAW link strings in a fetch-time ``visited`` set (lines 42/109) and counts
still-pending duplicates against the limit (line 110), so two spellings that
normalize to one canonical key (sorted query, stripped utm params, fragment)
or a URL discovered by two parents before being fetched consume extra limit
capacity there. This engine instead dedups at enqueue time on normalized
uniqueKeys — crawlee's production behavior and the right call at frontier
scale (a fetch-time raw-string set cannot be a distributed Bloom filter key).
Visit sets can therefore differ from the coordinator's whenever duplicate
spellings occur near the limit boundary; the in-repo simulator and golden
files encode THESE semantics, which is what parity tests check.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .catalog import Catalog
from .errors import failure_reason_col, should_retry_col
from .kernel.canonical import host_of
from .politeness import (
    apply_host_budget,
    path_filter_cond,
    robots_allowed,
    strategy_cond,
)
from .seen import (
    DRIVER_MERGE_MAX_BYTES,
    SEGMENT_SCHEMA,
    exact_antijoin,
    segments_to_driver,
)
from .udfs import make_extract_udf

FRONTIER_COLS = ["job_id", "url", "url_hash", "host", "origin", "path",
                 "depth", "seq", "round_added", "attempt"]
FRONTIER_SCHEMA = ("job_id string, url string, url_hash string, host string, "
                   "origin string, path string, depth int, seq long, "
                   "round_added int, attempt int")

# Frontier size above which budget_salt_n="auto" enables the two-stage
# salted per-host top-k. Measured crossover (BENCH.md round-5 skew probes):
# at ~10k rows/round salting is a 1.09x LOSS even with 92% of the frontier
# on one host; at 2M rows it is a 1.43x win (1.85x -> 1.29x). 500k sits
# safely above the loss regime and below the win regime.
SALT_FRONTIER_THRESHOLD = 500_000


def resolve_salt_n(configured: int | str, known_pending: int | None) -> int:
    """The budget_salt_n='auto' gate: salt (n=8) only when the round's
    frontier is known to exceed SALT_FRONTIER_THRESHOLD. Admission rows
    are salt-invariant (politeness.apply_host_budget), so this choice can
    never change crawl results — only the physical plan."""
    if configured != "auto":
        return configured
    return 8 if (known_pending or 0) >= SALT_FRONTIER_THRESHOLD else 0


@dataclass
class CrawlConfig:
    """Mirror of the reference's crawl_options zod schema with identical
    defaults (CrawlSchema.ts:6-49: max_depth default 10, strategy
    'same-domain', limit default 100... coordinator uses limit||10)."""

    job_id: str
    seed_url: str
    strategy: str = "same-domain"
    max_depth: int = 10
    limit: int = 100
    include_paths: list[str] = field(default_factory=list)
    exclude_paths: list[str] = field(default_factory=list)
    scrape_paths: list[str] = field(default_factory=list)
    politeness_budget: int = 0           # fetches per budget key per round; 0 = unlimited
    budget_scope: str = "host"           # 'host' or 'domain' (registrable) —
                                         # north rule: per-DOMAIN politeness
    budget_salt_n: int | str = "auto"    # >1: two-stage salted per-host top-k (hot
                                         # hosts); 0: plain window; "auto": salt only
                                         # when the round's frontier exceeds
                                         # SALT_FRONTIER_THRESHOLD (measured: salting
                                         # loses below ~10k rows/round — SCALING.json
                                         # skew_probe_bfs — and wins at 2M — skew_probe)
    max_attempts: int = 1                # fetch retries (Queue.ts:84-89 attempts=3)
    batch_size: int = 0                  # rows fetched per round; 0 = whole round
    respect_robots: bool = True          # --anycrawl-compat off ⇒ True (north rule)
    formats: tuple[str, ...] = ("markdown", "text", "links", "html")
    only_main_content: bool = True
    seen_filter: str = "bloom"           # 'bloom' | 'cuckoo' (north rule:
                                         # "partitioned Bloom/cuckoo filter");
                                         # results are byte-identical — the
                                         # filter only pre-routes candidates
                                         # ahead of the exact anti-join
    bloom_num_buckets: int = 32          # hash-space shards (both families)
    bloom_m_bits: int = 1 << 17
    bloom_k: int = 4
    cuckoo_n_slots: int = 1 << 12        # 4-way cuckoo buckets per segment
    max_rounds: int = 1000
    seen_compact_every: int = 8          # rewrite the seen table cumulatively
                                         # every K seen-writing rounds so its
                                         # read stays O(1) dirs, not O(rounds);
                                         # 0 disables
    simulate_fetch_errors: bool = False  # F11: draw all five failure classes
                                         # from corpus misses (tests/fixtures)
    proxy: str | None = None             # request proxy option (mode keyword
                                         # or custom URL); results carry the
                                         # RESOLVED mode name like Base.ts:1295
                                         # ('base' when unset / auto)
    fetch_semi_max: int = 1_000_000      # semi-reduce the corpus side of the
                                         # fetch join with a broadcast of the
                                         # admitted key set when the frontier
                                         # round is at most this many rows;
                                         # 0 disables (always shuffle join)
    prefilter_min_seen: int = 25_000     # engage the bloom/cuckoo PROBE only
                                         # once the seen set exceeds this many
                                         # hashes; below it the exact anti-join
                                         # alone is measurably cheaper than the
                                         # segment broadcast + Arrow probe
                                         # stage (BENCH.md r6). The filter is
                                         # still built/checkpointed every
                                         # round — this gates the physical
                                         # plan only, never membership

    def __post_init__(self) -> None:
        # zod schema bounds (CrawlSchema.ts:31-47) — parse() rejects, so do we
        if not 1 <= self.max_depth <= 50:
            raise ValueError(f"max_depth must be in [1, 50], got {self.max_depth}")
        if not 1 <= self.limit <= 50_000:
            raise ValueError(f"limit must be in [1, 50000], got {self.limit}")
        if self.strategy not in ("all", "same-domain", "same-hostname",
                                 "same-origin"):
            raise ValueError(f"unknown strategy {self.strategy!r}")
        if self.budget_scope not in ("host", "domain"):
            raise ValueError(f"unknown budget_scope {self.budget_scope!r}")
        from urllib.parse import urlsplit
        parts = urlsplit(self.seed_url or "")
        if parts.scheme not in ("http", "https") or not parts.hostname:
            # CrawlSchema's z.string().url() rejects non-URL seeds; a
            # scheme-less seed would otherwise canonicalize to a null-host
            # junk row and 'complete' a one-page crawl of nothing
            raise ValueError(f"seed_url must be an absolute http(s) URL, "
                             f"got {self.seed_url!r}")
        if self.politeness_budget < 0 or self.batch_size < 0:
            raise ValueError("politeness_budget/batch_size must be >= 0")
        if self.max_attempts < 1:
            raise ValueError("max_attempts must be >= 1")
        if isinstance(self.budget_salt_n, str):
            if self.budget_salt_n != "auto":
                raise ValueError(f"budget_salt_n must be an int >= 0 or "
                                 f"'auto', got {self.budget_salt_n!r}")
        elif self.budget_salt_n < 0:
            raise ValueError("budget_salt_n must be >= 0")
        if self.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown seen_filter {self.seen_filter!r}")
        from anycrawl_spark.cuckoo import check_n_slots

        check_n_slots(self.cuckoo_n_slots)

    def filter_family(self):
        """The configured seen-filter family with geometry bound."""
        from anycrawl_spark.seen import filter_family

        return filter_family(
            self.seen_filter, num_buckets=self.bloom_num_buckets,
            m_bits=self.bloom_m_bits, k=self.bloom_k,
            n_slots=self.cuckoo_n_slots)


def _strip_fragment(col):
    return F.split(col, "#", 2)[0]


# Canonical-column expression cache: the Column trees below are identical
# for every caller with the same url column name, but building them costs
# ~0.19 s of py4j round-trips — which the crawl loop used to pay EVERY
# round for the links subtree (profiled: _canonical_cols 1.67 s of a 25 s
# 10k crawl). Column objects are immutable and reusable across DataFrames;
# the cache is keyed by the owning SparkContext's applicationId so a
# restarted session (tests, CLI reruns) rebuilds instead of touching stale
# JVM references.
_CANON_EXPR_CACHE: dict[tuple[str, str], list] = {}


def _canonical_cols(df: DataFrame, url_col: str) -> DataFrame:
    """Attach (url_hash, host, origin, path) derived from the fragment-stripped
    canonical URL — the crawlee uniqueKey scope. All JVM expressions."""
    from .kernel.canonical import canonical_url_col

    app_id = df.sparkSession.sparkContext.applicationId
    key = (app_id, url_col)
    cached = _CANON_EXPR_CACHE.get(key)
    if cached is None:
        canon = _strip_fragment(canonical_url_col(url_col)).alias("__canon")
        c = F.col("__canon")
        derived = [
            F.sha2(c, 256).alias("url_hash"),
            F.lower(F.parse_url(c, F.lit("HOST"))).alias("host"),
            F.concat(
                F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)),
                F.lit("://"),
                # netloc minus userinfo from the canonical URL: keeps the
                # non-default port (canonicalization already stripped default
                # ports and lowercased the host), matching origin_of() — a
                # parse_url HOST here would drop ports and break same-origin
                # crawls of ported seeds
                F.regexp_replace(
                    F.regexp_extract(c, r"^[^:]+://([^/?#]*)", 1),
                    r"^.*@", ""),
            ).alias("origin"),
            F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("/")).alias("path"),
        ]
        cached = [canon, derived]
        if len(_CANON_EXPR_CACHE) > 8:   # sessions come and go in tests
            _CANON_EXPR_CACHE.clear()
        _CANON_EXPR_CACHE[key] = cached
    canon, derived = cached
    # withColumn-replacement semantics for any colliding names (none of the
    # engine's callers collide; keeps the contract for external callers)
    base = [F.col(c) for c in df.columns
            if c not in ("url_hash", "host", "origin", "path")]
    return df.select("*", canon).select(*base, *derived)


def prepare_corpus(pages: DataFrame, dedup: bool = True) -> DataFrame:
    """Corpus keyed by url_hash for the fetch join. At deployment scale the
    Iceberg pages table is bucketed by this hash so the join prunes
    partitions; html stays unread until after the join (column pruning).

    ``dedup`` keeps the LATEST capture per canonical-url hash — Common-Crawl
    style tables carry one row per (url, crawl), and a non-unique join key
    would fan out every downstream count (done/failed/pending arithmetic)
    and duplicate seq values in the visit log. One shuffle, paid once per
    engine (the corpus cache materializes the deduped frame); callers with
    an already-unique corpus can pass dedup=False."""
    corpus = _canonical_cols(pages, "url").select(
        F.col("url_hash").alias("page_url_hash"),
        F.col("url").alias("page_url"),
        "warc_ts", "html", "lang",
    )
    if dedup:
        w = Window.partitionBy("page_url_hash").orderBy(
            F.desc("warc_ts"), F.desc("page_url"))
        corpus = (corpus.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") == 1).drop("__rn"))
    return corpus


class CrawlEngine:
    def __init__(self, spark: SparkSession, corpus: DataFrame,
                 checkpoint_dir: str, robots: DataFrame | None = None,
                 cache_corpus: bool = True, prepared: bool = False) -> None:
        """``prepared=True``: the caller already ran prepare_corpus (and
        typically persisted the result) — the corpus is shared across crawl
        jobs, as an Iceberg pages table would be at deployment."""
        self.spark = spark
        self.corpus = corpus if prepared else prepare_corpus(corpus)
        if cache_corpus and not prepared:
            # local/bench convenience: avoid re-scanning + re-canonicalizing
            # the corpus every round. At deployment scale the corpus is an
            # Iceberg table bucketed by url_hash instead (no cache needed —
            # the join prunes buckets).
            from pyspark.storagelevel import StorageLevel

            self.corpus = self.corpus.persist(StorageLevel.MEMORY_AND_DISK)
        # Truncate the corpus lineage to a LogicalRDD (lazy localCheckpoint —
        # materialized by the first round's full corpus scan): every round
        # builds ~30 DataFrame ops whose eager analysis re-walks the whole
        # plan, and every per-round job re-optimizes it; carrying the
        # prepare_corpus subtree (scan → canonicalize → dedup window) in
        # each of them cost ~10 ms per op on the driver. Content-identical;
        # blocks are released by the ContextCleaner when the engine goes
        # out of scope.
        if cache_corpus or prepared:
            self.corpus = self.corpus.localCheckpoint(eager=False)
        self.catalog = Catalog(checkpoint_dir)
        self.robots = robots
        # driver-resident cumulative bloom segments (small-filter fast path;
        # see seen.DRIVER_MERGE_MAX_BYTES). _bloom_mem_round = the round the
        # cache is cumulative through; invalidated on resume (fresh engine).
        self._bloom_mem: dict[int, bytes] | None = None
        self._bloom_mem_round = -1
        # -- write pipelining (see _finalize_prev) --------------------------
        # The slow per-round parquet writes (results/visits/metrics/pending)
        # overlap the NEXT round's compute jobs: round r submits them async
        # and round r+1 finalizes (await -> commit -> release caches) right
        # before submitting its own writes. Next-round reads come from
        # in-memory state instead of committed files: _pending_mem (the
        # frontier DataFrame), _bloom_mem (driver-resident filter), and
        # _seen_uncommitted (synchronously-written seen files as
        # (round, path, compacted) — compacted entries supersede every
        # earlier round in _read_seen).
        self._prev_inflight: dict | None = None
        self._graveyard: list = []      # caches from two rounds back
        self._pending_mem: DataFrame | None = None
        self._seen_uncommitted: list[tuple[int, str, bool]] = []
        self._bloom_uncommitted: tuple[int, str] | None = None
        self._writes: ThreadPoolExecutor | None = None

    # -- state helpers ------------------------------------------------------
    def _progress(self) -> dict:
        last = self.catalog.last_round()
        if last is None:
            return {"round": -1, "done": 0, "failed": 0, "enqueued": 0, "finalized": False}
        return self.catalog.round_meta(last) or {}

    def _latest_bloom(self, spark: SparkSession,
                      up_to_round: int) -> DataFrame | None:
        """Newest bloom round ≤ ``up_to_round`` — committed, or the round
        whose write this run completed synchronously but whose manifest
        commit is still deferred (write pipelining). Bloom checkpoints are
        cumulative (each round's write is the OR-merge of its delta with
        the prior checkpoint), so the newest round alone IS the seen filter —
        no per-round history re-merge."""
        rounds = [rr for rr in self.catalog.committed_rounds("bloom")
                  if rr <= up_to_round]
        best = max(rounds) if rounds else None
        if (self._bloom_uncommitted is not None
                and self._bloom_uncommitted[0] <= up_to_round
                and (best is None or self._bloom_uncommitted[0] > best)):
            return spark.read.schema(SEGMENT_SCHEMA).parquet(
                self._bloom_uncommitted[1])
        if best is None:
            return None
        return self.catalog.read_round(spark, "bloom", best,
                                       schema=SEGMENT_SCHEMA)

    def _read_seen(self, spark: SparkSession,
                   up_to_round: int) -> DataFrame | None:
        """Seen-set union ≤ ``up_to_round``: committed rounds plus rounds
        whose files this run wrote synchronously ahead of their deferred
        manifest commit. An uncommitted COMPACTED round holds the full
        cumulative hash set, so every older round is excluded from the
        plan — not merely as an optimization: the compaction's deferred
        commit (replace=['seen']) deletes those superseded directories,
        and a plan still referencing them would hit FileNotFound when
        evaluated after _finalize_prev (e.g. a back-to-back compaction or
        a bloom rebuild with seen_compact_every=1)."""
        compacted = [rr for rr, _p, comp in self._seen_uncommitted
                     if comp and rr <= up_to_round]
        floor = max(compacted) if compacted else None
        rounds = [rr for rr in self.catalog.committed_rounds("seen")
                  if rr <= up_to_round
                  and (floor is None or rr > floor)]
        paths = [self.catalog.round_path("seen", rr) for rr in rounds]
        paths += [p for rr, p, _comp in self._seen_uncommitted
                  if rr <= up_to_round and rr not in rounds
                  and (floor is None or rr >= floor)]
        if not paths:
            return None
        return spark.read.schema("url_hash string").parquet(*paths)

    def _finalize_prev(self) -> None:
        """Complete the previous round's deferred tail: await its parquet
        writes, commit its manifest entry, then release the caches retired
        two rounds back (the previous round's in-flight writes may still
        reference last round's cached frames through deferred/retry
        lineage, so each round's caches live exactly one extra round)."""
        prev = self._prev_inflight
        self._prev_inflight = None
        if prev is not None:
            try:
                for fut in prev["futures"]:
                    fut.result()
                self.catalog.commit_round(prev["round"], prev["tables"],
                                          prev["meta"],
                                          replace=prev["replace"] or None)
                committed_seen = set(self.catalog.committed_rounds("seen"))
                self._seen_uncommitted = [
                    (rr, p, comp) for rr, p, comp in self._seen_uncommitted
                    if rr not in committed_seen]
                if (self._bloom_uncommitted is not None
                        and self._bloom_uncommitted[0]
                        in self.catalog.committed_rounds("bloom")):
                    self._bloom_uncommitted = None
            except BaseException:
                # a failed write/commit aborts the run — release EVERY
                # cached frame (this round's, the deferred tail's, and the
                # graveyard's) so the Spark session doesn't leak persisted
                # DataFrames past the failure
                for df in (prev["caches_now"] + prev["caches_later"]
                           + self._graveyard):
                    df.unpersist()
                self._graveyard = []
                raise
            # docs/admitted are only read by the just-awaited writes —
            # release them now (the payload-heavy frames). new_rows backs
            # the in-memory pending the CURRENT round's in-flight writes
            # still read, so it waits one more finalize in the graveyard.
            for df in prev["caches_now"]:
                df.unpersist()
        for df in self._graveyard:
            df.unpersist()
        self._graveyard = prev["caches_later"] if prev is not None else []

    # -- cancellation (Progress.ts:434-448) ---------------------------------
    # A marker file in the checkpoint root, so any process holding the
    # checkpoint path (an operator CLI, another driver) can cancel a running
    # job; the loop checks it between rounds — the batch analogue of the
    # reference's Redis `cancelled` flag checked in the per-request limit
    # hook. Survives resume: a cancelled checkpoint stays cancelled until
    # uncancel() clears it.

    def cancel(self) -> None:
        (self.catalog.root / "_cancelled").touch()

    def uncancel(self) -> None:
        marker = self.catalog.root / "_cancelled"
        if marker.exists():
            marker.unlink()

    def is_cancelled(self) -> bool:
        return (self.catalog.root / "_cancelled").exists()

    def _seed_frontier(self, cfg: CrawlConfig) -> DataFrame:
        # range(1) + literals instead of createDataFrame(local rows): a
        # local-Python-rows source is a pickled RDD whose scan needs Python
        # workers (measured ~1 s of worker spin-up per crawl job just to
        # collect the one seed row); a range source stays JVM-only.
        seed = self.spark.range(1).select(
            F.lit(cfg.job_id).alias("job_id"),
            F.lit(cfg.seed_url).alias("url"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("long").alias("seq"),
            F.lit(0).cast("int").alias("round_added"),
            F.lit(1).cast("int").alias("attempt"),
        )
        return _canonical_cols(seed, "url").select(*FRONTIER_COLS)

    # -- TTL eviction / monitor recrawl --------------------------------------
    # Deployment story (cuckoo.py module docstring): when a page-cache entry
    # passes its TTL tier (cache.py — page 2d / sitemap 7d), the monitor
    # evicts the URL from the URL-seen structures and re-enqueues it, so the
    # next `run(cfg, resume=True)` fetches a fresh copy. Both steps are
    # atomic manifest commits between runs.

    def _check_geometry(self, fam) -> None:
        """Filter family + geometry are baked into every checkpointed
        segment — resuming, evicting, or re-enqueuing with different
        parameters would read wrong bit positions / fingerprints (false
        negatives or IndexError in the tester) or commit wrong-geometry
        segments a later resume then trusts. Bloom keeps the historic
        [nb, m_bits, k] fingerprint shape; cuckoo prepends its family tag,
        so a family switch always mismatches."""
        seeded = self.catalog.round_meta(0) or {}
        fp = seeded.get("bloom_geometry")
        if fp is not None and fp != fam.geometry:
            raise ValueError(
                f"seen-filter geometry mismatch (bloom geometry "
                f"[nb, m_bits, k] or cuckoo geometry ['cuckoo', nb, "
                f"n_slots] is baked into checkpointed segments): "
                f"checkpoint has {fp}, config asks {fam.geometry}")

    def _canonical_rows(self, cfg: CrawlConfig, urls: list[str]) -> list:
        frontier = _canonical_cols(
            self.spark.createDataFrame([(cfg.job_id, u) for u in urls],
                                       schema="job_id string, url string"),
            "url")
        rows, seen_h = [], set()
        for row in frontier.collect():           # a monitor batch is small
            if row["url_hash"] not in seen_h:
                seen_h.add(row["url_hash"])
                rows.append(row)
        return rows

    def _write_filter_driver(self, cache: dict[int, bytes],
                             round_no: int) -> None:
        import pyarrow as pa

        self.catalog.append_round_local(
            pa.table({
                "bucket": pa.array(sorted(cache), type=pa.int32()),
                "bitmap": pa.array([cache[b] for b in sorted(cache)],
                                   type=pa.binary()),
            }), "bloom", round_no)

    def evict_urls(self, cfg: CrawlConfig, urls: list[str]) -> dict:
        """Remove URLs from the committed seen state (TTL expiry): the
        exact seen set is rewritten compacted minus the evicted hashes,
        and the cumulative filter is amended — cuckoo via true deletion
        (fam.delete_driver; one copy per distinct key makes it
        collision-safe), bloom or a saturated cuckoo segment via a full
        rebuild from the compacted exact seen (the same rebuild-from-
        history remedy resume applies to corrupt segments). One commit,
        replace=['seen','bloom']."""
        spark = self.spark
        progress = self._progress()
        if progress["round"] < 0:
            raise ValueError("no committed crawl state to evict from")
        if not progress.get("finalized"):
            # resume reads only the newest round's pending table — an
            # eviction round on an unfinished job would orphan its frontier
            raise ValueError("evict_urls runs between jobs — resume the "
                             "crawl to completion first")
        r = progress["round"] + 1
        fam = cfg.filter_family()
        self._check_geometry(fam)

        seen = self._read_seen(spark, progress["round"])
        if seen is None:
            raise ValueError("no seen state committed yet")
        requested = [row["url_hash"] for row in self._canonical_rows(cfg,
                                                                     urls)]
        evict_df = spark.createDataFrame([(h,) for h in requested],
                                         "url_hash string")
        # Evict only hashes actually IN the seen set: cuckoo deletion is
        # defined only for tracked insertions — deleting a never-inserted
        # hash could zero a colliding member's only fingerprint copy and
        # break the no-false-negative contract (cuckoo.py _delete).
        hashes = sorted(row["url_hash"] for row in seen.join(
            F.broadcast(evict_df), "url_hash", "left_semi")
            .select("url_hash").distinct().collect())
        remaining = seen.join(F.broadcast(evict_df), "url_hash", "left_anti")
        self.catalog.append_round(remaining, "seen", r)

        deleted = False
        if (fam.delete_driver is not None
                and fam.total_bytes <= DRIVER_MERGE_MAX_BYTES):
            prior = self._latest_bloom(spark, progress["round"])
            if prior is not None:
                cache, skipped = fam.delete_driver(
                    segments_to_driver(prior), hashes)
                if not skipped:
                    self._write_filter_driver(cache, r)
                    deleted = True
        if not deleted:
            # bloom (no deletion) / saturated segment / oversized filter:
            # rebuild the cumulative filter from the compacted exact seen
            self.catalog.append_round(
                fam.build_segments(
                    self.catalog.read_round_uncommitted(spark, "seen", r)),
                "bloom", r)

        meta = {**progress, "round": r, "finalized": True,
                "pending_next": 0, "phase": "evicted",
                "evicted": len(hashes), "filter_deletion": deleted}
        self.catalog.commit_round(r, ["seen", "bloom"], meta,
                                  replace=["seen", "bloom"])
        self._bloom_mem, self._bloom_mem_round = None, -1
        return meta

    def reenqueue_urls(self, cfg: CrawlConfig, urls: list[str]) -> dict:
        """Enqueue URLs as a fresh pending round (the monitor re-check):
        frontier rows at depth 0 with enqueue seqs continuing the job's
        dense numbering, hashes re-marked seen, and the cumulative filter
        re-inserted — the other half of the cuckoo delete/insert round
        trip. `run(cfg, resume=True)` then fetches them (the admission
        limit still applies: pass a limit above the job's done count)."""
        import pyarrow as pa

        spark = self.spark
        progress = self._progress()
        if progress["round"] < 0:
            raise ValueError("no committed crawl state to enqueue into")
        if not progress.get("finalized"):
            raise ValueError("reenqueue_urls runs between jobs — resume "
                             "the crawl to completion first")
        r = progress["round"] + 1
        fam = cfg.filter_family()
        self._check_geometry(fam)
        rows = self._canonical_rows(cfg, urls)
        base = progress["enqueued"]

        pa_schema = pa.schema([
            ("job_id", pa.string()), ("url", pa.string()),
            ("url_hash", pa.string()), ("host", pa.string()),
            ("origin", pa.string()), ("path", pa.string()),
            ("depth", pa.int32()), ("seq", pa.int64()),
            ("round_added", pa.int32()), ("attempt", pa.int32()),
        ])
        cols = {
            "job_id": [row["job_id"] for row in rows],
            "url": [row["url"] for row in rows],
            "url_hash": [row["url_hash"] for row in rows],
            "host": [row["host"] for row in rows],
            "origin": [row["origin"] for row in rows],
            "path": [row["path"] for row in rows],
            "depth": [0] * len(rows),
            "seq": [base + i for i in range(len(rows))],
            "round_added": [r] * len(rows),
            "attempt": [1] * len(rows),
        }
        self.catalog.append_round_local(pa.table(cols, schema=pa_schema),
                                        "pending", r)
        hashes = [row["url_hash"] for row in rows]
        self.catalog.append_round_local(
            pa.table({"url_hash": pa.array(hashes, type=pa.string())}),
            "seen", r)

        if fam.total_bytes <= DRIVER_MERGE_MAX_BYTES:
            prior = self._latest_bloom(spark, progress["round"])
            cache = segments_to_driver(prior) if prior is not None else {}
            cache = fam.merge_driver(cache, fam.build_driver(hashes))
            self._write_filter_driver(cache, r)
        else:
            # distributed-size filter: cumulative write = prior checkpoint
            # OR-merged with the delta built from the new pending rows
            delta = fam.build_segments(
                self.catalog.read_round_uncommitted(spark, "pending", r))
            prior = self._latest_bloom(spark, progress["round"])
            segs = (delta if prior is None
                    else fam.merge_segments(prior.unionByName(delta)))
            self.catalog.append_round(segs, "bloom", r)

        meta = {**progress, "round": r, "finalized": False,
                "enqueued": base + len(rows), "pending_next": len(rows),
                "pending_seq_range": [base, max(base, base + len(rows) - 1)],
                "phase": "recrawl_enqueued"}
        # cumulative filter: retire the prior copy, like the round loop
        self.catalog.commit_round(r, ["pending", "seen", "bloom"], meta,
                                  replace=["bloom"])
        self._bloom_mem, self._bloom_mem_round = None, -1
        self._pending_mem = None
        return meta

    # -- the round loop -----------------------------------------------------
    def _static_exprs(self, cfg: CrawlConfig, extract_udf) -> dict:
        """Round-invariant Column expression trees, built ONCE per run.

        Profiling a 10k-limit crawl showed ~9.4 s of a 25 s run spent in
        driver-side py4j round-trips, most of it re-building identical
        Column objects every round (the docs select list, the failure
        classifier tree, the link filters). Column objects are immutable
        and reusable across DataFrames, so the loop now builds them here
        and re-uses them; only genuinely per-round literals (round number,
        width-bucket bounds, enqueue offsets) are constructed inside
        _run_round."""
        ex: dict = {}
        ex["keys_sel"] = F.col("url_hash").alias("page_url_hash")
        if cfg.simulate_fetch_errors:
            sim = F.pmod(
                F.conv(F.substring("url_hash", 1, 4), 16, 10).cast("long"),
                F.lit(5))
            miss_msg = (
                F.when(sim == 0, "cloudflare challenge detected CF_CHALLENGE")
                .when(sim == 1, "Received blocked status code: 403")
                .when(sim == 2, "ERR_PROXY_CONNECTION_FAILED while fetching")
                .when(sim == 3, "Navigation timeout of 30000 ms exceeded")
                .otherwise("Received 404 status code")
            )
        else:
            miss_msg = F.lit("Received 404 status code")
        # status, error_message, and doc are all keyed on the same corpus
        # hit (status == 200 ⇔ html IS NOT NULL by construction), so one
        # select derives all three — fewer eagerly-analyzed plan steps per
        # round than the old status → error → doc chain, same values
        hit = F.col("html").isNotNull()
        ex["fetch_derived"] = [
            F.when(hit, 200).otherwise(404).alias("status"),
            F.when(hit, F.lit(None).cast("string"))
            .otherwise(miss_msg).alias("error_message"),
            F.when(hit, extract_udf(F.col("url"), F.col("html")))
            .alias("doc"),
        ]
        ex["docs_fields"] = [
            F.col(c) for c in ("job_id", "url", "url_hash", "host", "depth",
                               "seq", "attempt", "status")
        ] + [
            # F11 error classification (EngineConfigurator.ts:599-613):
            # five-class mapToFailureReason over the fetch error message
            F.when(F.col("status") == 200, F.lit(None).cast("string"))
            .otherwise(failure_reason_col(F.col("error_message")))
            .alias("failure_reason"),
            F.col("error_message"),
            F.col("doc.title").alias("title"),
            F.col("doc.metadata").alias("metadata"),
            F.col("doc.html").alias("html_clean"),
            F.col("doc.markdown").alias("markdown"),
            F.col("doc.text").alias("text"),
            F.col("doc.links").alias("links"),
            F.length("html").alias("bytes"),
        ]
        # Base.ts:1294-1295: every result document carries the resolved
        # proxy mode name ('base' when no proxy option is set)
        ex["proxy"] = F.lit(self._resolved_proxy_mode(cfg)).alias("proxy")
        ex["should_scrape"] = (
            path_filter_cond(F.col("url"), cfg.scrape_paths, [])
            if cfg.scrape_paths else F.lit(True)).alias("should_scrape")
        final_attempt = ((F.col("status") == 200)
                         | (F.col("attempt") >= cfg.max_attempts))
        if cfg.simulate_fetch_errors:
            # per-class retry decision (errorHandler): non-retryable classes
            # fail on their first attempt regardless of max_attempts
            final_attempt = final_attempt | ~should_retry_col(
                F.col("error_message"))
        ex["final_attempt"] = final_attempt
        ex["outcome_key"] = final_attempt.alias("final")
        ex["outcome_aggs"] = [F.count("*").alias("count"),
                              F.min("seq").alias("min_seq"),
                              F.max("seq").alias("max_seq")]
        ex["metrics_key"] = F.spark_partition_id().alias("partition_id")
        ex["metrics_aggs"] = [
            F.count("*").alias("urls"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0))
            .alias("fetched"),
            F.sum(F.coalesce(F.col("bytes"), F.lit(0))).alias("bytes")]
        ex["job_id"] = F.lit(cfg.job_id).alias("job_id")
        ex["visits_sel"] = [F.col(c) for c in
                            ("job_id", "url", "url_hash", "host", "depth",
                             "seq", "attempt", "status", "round")]
        ex["links_pre"] = [
            F.col("job_id"),
            F.col("depth").alias("parent_depth"),
            F.col("seq").alias("parent_seq"),
            F.posexplode_outer("links").alias("link_pos", "url"),
        ]
        ex["status_200"] = F.col("status") == 200
        ex["links_precond"] = (
            F.col("url").isNotNull()
            & (F.col("parent_depth") < cfg.max_depth)              # F6
            & F.col("url").startswith("http"))
        ex["links_cond"] = (
            strategy_cond(F.col("host"), F.col("origin"), cfg.seed_url,
                          cfg.strategy)
            & path_filter_cond(F.col("url"), cfg.include_paths,
                               cfg.exclude_paths))
        link_cols = ["job_id", "parent_depth", "parent_seq", "link_pos",
                     "url", "host", "origin", "path"]
        ex["dedup_agg"] = F.min_by(
            F.struct(*[F.col(c) for c in link_cols]),
            F.struct(F.col("parent_seq"), F.col("link_pos"))).alias("__first")
        ex["dedup_sel"] = [F.col("url_hash")] + [
            F.col(f"__first.{c}").alias(c) for c in link_cols]
        w_local = Window.partitionBy("__bucket").orderBy(
            "parent_seq", "link_pos")
        ex["lrn"] = F.row_number().over(w_local).alias("__lrn")
        ex["ranked_sel"] = [F.col(c) for c in
                            ("job_id", "url", "url_hash", "host", "origin",
                             "path", "parent_depth", "__bucket", "__lrn")]
        ex["frontier_head"] = [F.col(c) for c in
                               ("job_id", "url", "url_hash", "host",
                                "origin", "path")]
        ex["new_depth"] = (F.col("parent_depth") + 1).alias("depth")
        ex["new_attempt"] = F.lit(1).alias("attempt")
        return ex

    @staticmethod
    def _resolved_proxy_mode(cfg: CrawlConfig) -> str:
        """libs/proxy.ts:54-71 via Base.ts:1294-1295: the mode name the
        result document reports — 'base' for unset/base/auto, 'stealth'
        only when a stealth pool is actually configured, 'custom' for a
        URL.  Reads the reference's own env names so a deployment that
        sets ANYCRAWL_PROXY_STEALTH_URL reports identically."""
        from anycrawl_spark.proxy import (get_resolved_proxy_mode,
                                          parse_proxy_urls)

        return get_resolved_proxy_mode(
            cfg.proxy,
            parse_proxy_urls(os.environ.get("ANYCRAWL_PROXY_STEALTH_URL")))

    def run(self, cfg: CrawlConfig, resume: bool = False) -> dict:
        t0 = time.time()
        # reset pipelining state: run() may be called again on one engine
        # (resume/cancel tests); in-memory state from a prior run is stale
        self._prev_inflight = None
        self._graveyard = []
        self._pending_mem = None
        self._seen_uncommitted = []
        self._bloom_uncommitted = None
        self._writes = ThreadPoolExecutor(max_workers=8)
        try:
            return self._run_loop(cfg, resume, t0)
        finally:
            # flush the deferred tail even when resume validation / seeding
            # throws: the last round's writes + commit, then every cache
            # still parked in the graveyard chain; always release the
            # executor (a leaked pool accumulates 8 threads per failed call)
            try:
                self._finalize_prev()
                self._finalize_prev()
            finally:
                self._pending_mem = None
                self._writes.shutdown(wait=True)
                self._writes = None

    def _run_loop(self, cfg: CrawlConfig, resume: bool, t0: float) -> dict:
        fam = cfg.filter_family()
        if resume:
            self.catalog.drop_uncommitted()
            progress = self._progress()
            round_no = progress["round"] + 1
            self._check_geometry(fam)
        else:
            self.catalog.destroy()
            self.catalog = Catalog(self.catalog.root)
            self._bloom_mem = None
            self._bloom_mem_round = -1
            progress = {"round": -1, "done": 0, "failed": 0, "enqueued": 0, "finalized": False}
            round_no = 0

        if round_no == 0:
            frontier = self._seed_frontier(cfg)
            if self.robots is not None and cfg.respect_robots:
                frontier = robots_allowed(frontier, self.robots)
            if fam.total_bytes <= DRIVER_MERGE_MAX_BYTES:
                # driver-local seed round: the frontier is one seed row
                # (already driver-built) — one collect replaces four Spark
                # jobs (count + pending/seen/bloom writes), shaving ~2 s of
                # fixed startup from every crawl job. File layout, schema,
                # and manifest are identical to the distributed path.
                import pyarrow as pa

                rows = frontier.collect()
                n_seed = len(rows)
                pa_schema = pa.schema([
                    ("job_id", pa.string()), ("url", pa.string()),
                    ("url_hash", pa.string()), ("host", pa.string()),
                    ("origin", pa.string()), ("path", pa.string()),
                    ("depth", pa.int32()), ("seq", pa.int64()),
                    ("round_added", pa.int32()), ("attempt", pa.int32()),
                ])
                self.catalog.append_round_local(
                    pa.table({c: [r[c] for r in rows]
                              for c in FRONTIER_COLS}, schema=pa_schema),
                    "pending", 0)
                hashes = [r["url_hash"] for r in rows]
                self.catalog.append_round_local(
                    pa.table({"url_hash": pa.array(hashes, type=pa.string())}),
                    "seen", 0)
                seed_bloom = fam.build_driver(hashes)
                self.catalog.append_round_local(
                    pa.table({
                        "bucket": pa.array(sorted(seed_bloom),
                                           type=pa.int32()),
                        "bitmap": pa.array(
                            [seed_bloom[b] for b in sorted(seed_bloom)],
                            type=pa.binary()),
                    }),
                    "bloom", 0)
                self._bloom_mem = seed_bloom
                self._bloom_mem_round = 0
            else:
                n_seed = frontier.count()
                self.catalog.append_round(frontier, "pending", 0)
                self.catalog.append_round(
                    frontier.select("url_hash"), "seen", 0)
                self.catalog.append_round(fam.build_segments(frontier),
                                          "bloom", 0)
            progress = {"round": 0, "done": 0, "failed": 0, "enqueued": n_seed,
                        "finalized": n_seed == 0, "phase": "seeded",
                        "pending_seq_range": [0, max(0, n_seed - 1)],
                        "bloom_geometry": fam.geometry}
            self.catalog.commit_round(0, ["pending", "seen", "bloom"], progress)
            round_no = 1

        extract_udf = make_extract_udf(
            formats=cfg.formats, only_main_content=cfg.only_main_content)
        ex = self._static_exprs(cfg, extract_udf)

        while round_no <= cfg.max_rounds and not progress.get("finalized"):
            if self.is_cancelled():
                # Progress.cancel (Progress.ts:434-448): mark finalized
                # immediately; the limit hook skips admission when
                # cancelled (EngineConfigurator.ts:84-99). Between-rounds
                # is the batch equivalent of between-requests.
                self._finalize_prev()
                progress = {**progress, "round": round_no,
                            "finalized": True, "cancelled": True,
                            "phase": "cancelled"}
                self.catalog.commit_round(round_no, [], progress)
                break
            progress = self._run_round(cfg, round_no, progress, ex, fam)
            round_no += 1

        fetched_total = progress["done"] - progress["failed"]
        return {
            "job_id": cfg.job_id,
            "rounds": progress["round"],
            "done": progress["done"],
            "fetched": fetched_total,
            "failed": progress["failed"],
            "enqueued": progress["enqueued"],
            "seconds": time.time() - t0,
        }

    def _run_round(self, cfg: CrawlConfig, r: int, progress: dict,
                   ex: dict, fam) -> dict:
        spark = self.spark
        writes = self._writes
        _t0 = time.time()
        # pending: the in-memory frontier from last round (write pipelining —
        # its parquet write may still be in flight) or, on resume / first
        # round, the committed checkpoint
        pending = (self._pending_mem if self._pending_mem is not None
                   else self.catalog.read_round(spark, "pending", r - 1,
                                                schema=FRONTIER_SCHEMA))
        # drain check: the prior round's meta already counted pending rows
        # (pending_next / seed enqueued), so only fall back to a head(1)
        # probe job when the count is absent (legacy checkpoints)
        known_pending = progress.get("pending_next",
                                     progress.get("enqueued")
                                     if progress.get("phase") == "seeded"
                                     else None)
        drained = (pending is None
                   or (known_pending == 0 if known_pending is not None
                       else not pending.head(1)))
        if drained:
            self._finalize_prev()
            meta = {**progress, "round": r, "finalized": True, "phase": "drained"}
            self.catalog.commit_round(r, [], meta)
            return meta

        # --- politeness: per-host budget window (the host shuffle) ---------
        if not cfg.politeness_budget and not cfg.batch_size:
            # unlimited budget: all pending admitted; a schema-only empty
            # frame (no lineage back into pending) keeps the deferred branch
            # out of the next round's write plans entirely. range(0) keeps
            # the empty source JVM-only (createDataFrame([]) is a pickled
            # RDD that pulls in Python workers when scanned).
            if "empty_pending" not in ex:
                ex["empty_pending"] = [
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in pending.schema.fields]
            admitted, deferred = pending, spark.range(0).select(
                *ex["empty_pending"])
        else:
            # Salting is a large-frontier knob: below ~10k rows/round the
            # two-stage top-k's extra partial agg costs more than the skew
            # it removes (SCALING.json skew_probe_bfs: salt8 1.09x SLOWER
            # on a 92%-one-host crawl at limit 10k), while at 2M rows it
            # wins 1.85x -> 1.29x (skew_probe). "auto" gates on the prior
            # round's recorded frontier size; admission rows are
            # salt-invariant, so the gate cannot change crawl results.
            salt_n = resolve_salt_n(cfg.budget_salt_n, known_pending)
            admitted, deferred = apply_host_budget(
                pending, cfg.politeness_budget, order_cols=("depth", "seq"),
                salt_n=salt_n, scope=cfg.budget_scope)
        if cfg.batch_size and cfg.batch_size > 0:
            # coordinator batch semantics (crawlCoordinator.ts:33-38): take
            # the first batch_size rows in FIFO (seq) order
            batch = admitted.orderBy("seq").limit(cfg.batch_size)
            deferred = pending.join(batch.select("url_hash"), "url_hash", "left_anti")
            admitted = batch
        # unlimited budget: admitted IS pending (often already a cached
        # new_rows frame from last round) and feeds only the docs subtree,
        # which is cached itself — an extra cache would just serialize the
        # frontier twice. Budget/batch rounds reference admitted from
        # several branches, so cache it there.
        admitted_cached = bool(cfg.politeness_budget or cfg.batch_size)
        if admitted_cached:
            admitted = admitted.cache()

        # --- fetch = equi-join against the corpus --------------------------
        # The join shuffle hash-partitions on url_hash; AQE parallelismFirst
        # keeps >= defaultParallelism partitions, so the extraction UDF runs
        # at full width without an extra shuffle of the html payload (an
        # explicit repartition here measured 3.6x slower in the bulk path).
        #
        # Small-frontier fast path: a BFS round's frontier is orders of
        # magnitude smaller than the standing corpus, and a left join can't
        # broadcast its left side — so the plain plan re-EXCHANGES the full
        # corpus (html payloads included) every round, which measured as
        # ~3.5 s/round of pure fixed cost at sf0.1 regardless of round size.
        # Semi-reducing the corpus with a broadcast of the admitted key set
        # first means the join shuffles only the matched pages (≤ admitted
        # rows). Identity-preserving: reducing the right side of a left
        # join by the left side's keys changes nothing. Gated on the
        # driver-known pending count: a 10^10-frontier round with millions
        # of admitted rows would blow the key broadcast, and falls back to
        # the hash join (deployment posture there: corpus bucketed by
        # url_hash, which removes the corpus exchange instead).
        corpus_side = self.corpus
        if (cfg.fetch_semi_max > 0 and known_pending is not None
                and 0 < known_pending <= cfg.fetch_semi_max):
            keys = admitted.select(ex["keys_sel"])
            corpus_side = self.corpus.join(F.broadcast(keys),
                                           "page_url_hash", "left_semi")
        # F11: a corpus miss carries an error message like a fetch error
        # would (ex["error_msg"]; simulate_fetch_errors draws all five
        # failure classes deterministically from the url hash).
        fetched = (
            admitted.join(corpus_side,
                          admitted["url_hash"] == corpus_side["page_url_hash"],
                          "left")
            .drop("page_url_hash")
        )

        # Extraction width scaled to the round (guide §2.2): the fetch-join
        # shuffle leaves 2×cores partitions, so a 100-row round still paid
        # ~64 task launches plus 64 Arrow round-trips in the docs
        # materialization — ~0.4 s of fixed cost per round. For small
        # rounds, re-exchange the matched rows (tiny at that size) down to
        # ~64 pages/task before the UDF projection; a coalesce would
        # instead merge the whole narrow chain — measured pulling the full
        # corpus-side scan into the shrunken stage (8 s/round single-task).
        # Width capped at defaultParallelism so the re-exchanged stage is
        # one task per core: the per-task fixed cost (Arrow round-trip +
        # scheduling) dominates 64-row batches, and 50 tasks on 32 cores
        # measured slower than 32×100-row tasks on identical rows (0.78 s
        # vs 0.65 s for 3200 pages — tools/kernel_bench-style A/B).
        # Driver-known count, deterministic; big rounds keep full width.
        if known_pending is not None and known_pending <= 4096:
            fetched = fetched.repartition(
                max(1, min(spark.sparkContext.defaultParallelism,
                           (known_pending + 63) // 64)), "url_hash")
        # --- extraction (vectorized UDF) -----------------------------------
        docs = (
            fetched.select("*", *ex["fetch_derived"])
            .select(*ex["docs_fields"], F.lit(r).alias("round"),
                    ex["proxy"], ex["should_scrape"])
            .cache()
        )
        # Scale-adaptive consumer view (guide §2.2/§6): the cached docs
        # frame keeps the fetch-join's full shuffle width so the extraction
        # UDF materializes at full parallelism (the cache also pins that
        # width — canChangeCachedPlanOutputPartitioning is off, so AQE
        # cannot byte-coalesce the compute-dense extract stage). But every
        # CONSUMER job (results/visits writes, outcome counts) then paid 64
        # task launches and wrote 64 splinter files per round regardless of
        # round size — for a 100-row round that is pure scheduling overhead
        # (measured ~0.55 s per job). Consumers therefore read a coalesced
        # view sized from the driver-known round size (~1k rows/task);
        # coalesce over the cached scan is a narrow op reading the same
        # blocks, so the extraction work is not re-partitioned. The metrics
        # aggregation stays on the full-width frame — its rows record
        # spark_partition_id() lineage, which the view would renumber.
        if known_pending is not None:
            n_view = max(1, min(spark.sparkContext.defaultParallelism,
                                (known_pending + 999) // 1000))
            docs_view = docs.coalesce(n_view)
        else:
            n_view = None
            docs_view = docs

        final_attempt = ex["final_attempt"]

        # --- discovery subtree construction (links → filters → seen) -------
        # Built BEFORE the outcome job so its one materialization (the
        # eager localCheckpoint in _build_ranked) can run CONCURRENTLY with
        # the outcome counts: both evaluate the cached docs frame (block
        # locks serialize per-partition compute), so wall time is ~max of
        # the two jobs instead of their sum. The width_bucket bounds come
        # from the prior round's recorded pending seq range when available
        # (bounds only need to COVER the admitted parents' seqs — bucket
        # boundaries don't affect the dense numbering, which orders by
        # bucket then (parent_seq, link_pos)); on legacy/resumed checkpoints
        # without the range, materialization waits for the outcome job's
        # min/max seq.
        enqueued = progress["enqueued"]
        disc_build = None
        disc_fut = None
        if enqueued < cfg.limit:
            links = (
                docs.where(ex["status_200"])
                .select(*ex["links_pre"])
                .where(ex["links_precond"])
            )
            links = _canonical_cols(links, "url")
            links = links.where(ex["links_cond"])
            if self.robots is not None and cfg.respect_robots:
                links = robots_allowed(links, self.robots)

            # in-batch dedup: first discovery wins (FIFO order). min_by over
            # the (parent_seq, link_pos) struct ⇔ row_number()==1 over that
            # order — (parent_seq, link_pos) is unique per discovered link,
            # so no tie ambiguity — but as a hash aggregation it partially
            # aggregates map-side, shuffling one row per distinct url per
            # map partition instead of every duplicate discovery, and needs
            # no sort (guide §2.3: aggregate before you shuffle; BFS fanout
            # makes duplicate links the common case)
            links = (
                links.groupBy("url_hash")
                .agg(ex["dedup_agg"])
                .select(*ex["dedup_sel"])
            )

            # seen filter: Bloom pre-filter + exact anti-join. Each bloom
            # round checkpoint is CUMULATIVE (delta OR-merged into the prior
            # round's segments at write time), so reading the seen-filter is
            # one round directory — O(1) per round, not O(rounds) re-merges.
            driver_bloom = fam.total_bytes <= DRIVER_MERGE_MAX_BYTES
            seen = self._read_seen(spark, r - 1)
            # The probabilistic pre-filter earns its keep only once the
            # seen set is large: below prefilter_min_seen hashes the exact
            # anti-join alone is measurably cheaper per round than the
            # segment broadcast + Arrow probe stage it would precede
            # (BENCH.md r6 probe: 0.57s vs 1.09s at 5k seen hashes), so
            # small standing frontiers skip the probe. The filter is still
            # primed and maintained every round — checkpoints, resume
            # geometry, and the at-scale path are untouched; like
            # budget_salt_n='auto' this gates only the physical plan,
            # never membership results.
            prefilter_on = progress["enqueued"] > cfg.prefilter_min_seen
            segments = None
            if driver_bloom:
                if self._bloom_mem is None or self._bloom_mem_round != r - 1:
                    seg_df = self._latest_bloom(spark, up_to_round=r - 1)
                    if seg_df is not None:
                        self._bloom_mem = segments_to_driver(seg_df)
                        self._bloom_mem_round = r - 1
                if prefilter_on and self._bloom_mem is not None:
                    # driver-resident filter: hand the dict straight to the
                    # probe (broadcast once per executor) — no per-row
                    # bitmap column, no createDataFrame scan per round
                    segments = self._bloom_mem
            else:
                segments = self._latest_bloom(spark, up_to_round=r - 1)
            if prefilter_on:
                links = fam.filter_new(links, segments, seen)
            elif seen is not None:
                links = exact_antijoin(links, seen)

            n_buckets = 4 * spark.sparkContext.defaultParallelism

            def disc_build(lo, hi, links=links, n_buckets=n_buckets):
                # ONE evaluation of the discovery subtree: rank within
                # bucket (needs no cross-bucket knowledge), eagerly
                # localCheckpoint the ranked frame; counts and the capped
                # new_rows both derive from the checkpointed blocks.
                #
                # localCheckpoint, NOT cache: the frontier delta is the
                # round boundary — the next round's whole plan (and this
                # round's in-flight writes) sit on top of it. A cache here
                # nests InMemoryRelations round over round; unpersisting
                # any mid-chain entry makes later plan lookups miss and
                # re-derive the entire crawl history (measured: outcome-job
                # task counts growing ~3x per round). Checkpointing
                # truncates lineage to a LogicalRDD — no plan matching, no
                # recompute path. Blocks are freed by the ContextCleaner
                # once the graveyard drops the reference.
                ranked_df = (
                    links.select(
                        "*",
                        F.width_bucket(F.col("parent_seq"), F.lit(lo),
                                       F.lit(hi + 1), F.lit(n_buckets))
                        .alias("__bucket"))
                    .select("*", ex["lrn"])
                    .select(*ex["ranked_sel"])
                )
                if n_view is not None:
                    # checkpoint the frontier delta at round-size-matched
                    # width: its consumers (counts collect, enqueue select,
                    # pending write) are all thin per-row work, and 64
                    # splinter blocks/files per small round cost more in
                    # task launches than the data
                    ranked_df = ranked_df.coalesce(n_view)
                return ranked_df.localCheckpoint()

            bounds = progress.get("pending_seq_range")
            if bounds is not None:
                disc_fut = writes.submit(disc_build, bounds[0], bounds[1])
        _t_plan = time.time()

        # One job: outcome counts (progress/retry math) + the admitted seq
        # range (dense-seq bucketing fallback for checkpoints without a
        # recorded pending seq range). Submitted ASYNC: nothing in the round
        # needs the result before meta-build time — the drain check subsumes
        # `done >= limit` (done counts admitted rows, which are capped by
        # the enqueue limit, so done can only reach the limit when pending
        # also empties), capacity uses the driver-known `enqueued`, and the
        # width_bucket bounds come from pending_seq_range. The job runs
        # concurrently with the discovery checkpoint and the doc writes
        # (block-level cache locks make the shared docs materialization
        # single-compute). The no-bounds fallback resolves it early.
        def _outcome_job():
            return (
                docs_view.groupBy("status", ex["outcome_key"])
                .agg(*ex["outcome_aggs"])
                .collect()
            )

        outcome_fut = writes.submit(_outcome_job)
        _t_fetch = time.time()


        # results: persistence gated by scrape_paths (F5) — links still flow;
        # visits: complete per-round visit log (crawl-order golden surface).
        # The docs-derived writes are independent reads of the cached docs →
        # submitted concurrently (Spark schedules concurrent jobs fine; each
        # write targets its own round directory). None of them is awaited in
        # this round: _finalize_prev() awaits + commits them while the NEXT
        # round's compute jobs run (write pipelining).
        pending_writes = [
            writes.submit(
                self.catalog.append_round,
                docs_view.where(F.col("should_scrape")).drop("links", "should_scrape"),
                "results", r),
            writes.submit(
                self.catalog.append_round,
                docs_view.select(*ex["visits_sel"]),
                "visits", r),
        ]

        # per-partition lineage/metrics (north rule)
        metrics = (
            docs.groupBy(ex["metrics_key"], "host")
            .agg(*ex["metrics_aggs"])
            .select("*", F.lit(r).alias("round"), ex["job_id"])
        )
        pending_writes.append(
            writes.submit(self.catalog.append_round, metrics, "metrics", r))

        # --- discover → filter → dedup → enqueue ---------------------------
        new_rows = None
        ranked = None
        n_new = 0
        if disc_build is not None:
            capacity = cfg.limit - enqueued
            # Buckets whose cumulative offset already exceeds the enqueue
            # capacity are pruned before the offsets join.
            if disc_fut is not None:
                ranked = disc_fut.result()
                _t_ranked = time.time()
            else:
                # no recorded pending_seq_range (resume/legacy checkpoint):
                # the outcome job's min/max seq supplies the bounds
                outcome_rows = outcome_fut.result()
                outcome_fut = None
                seq_lo = min((row["min_seq"] for row in outcome_rows),
                             default=0)
                seq_hi = max((row["max_seq"] for row in outcome_rows),
                             default=0)
                ranked = disc_build(seq_lo, seq_hi)
                _t_ranked = time.time()
            counts = {row["__bucket"]: row["cnt"] for row in
                      ranked.groupBy("__bucket").agg(
                          F.max("__lrn").alias("cnt")).collect()}
            _t_counts = time.time()
            total = sum(counts.values())
            offsets, acc = [], 0
            for b in sorted(counts):
                offsets.append((b, acc))
                acc += counts[b]
            # bucket→offset as a literal map expression, not a broadcast
            # join of a createDataFrame frame: local Python rows make a
            # pickled RDD whose broadcast build re-ran Python workers in
            # every job that touched new_rows, each round. element_at on a
            # literal map is pure codegen; a bucket pruned by the capacity
            # check is absent from the map → null → filtered, exactly the
            # inner join's semantics. Bucket count is bounded (4×cores), so
            # the literal stays small at any scale.
            # one F.expr over a rendered literal string: building the same
            # map from per-literal F.lit().cast() Column objects cost ~250
            # py4j round-trips per round on the driver (profiled ~0.24 s)
            off_items = ",".join(f"{b}L,{o}L" for b, o in offsets
                                 if o < capacity)
            off_map = F.expr(f"map({off_items})" if off_items
                             else "cast(map() as map<bigint,bigint>)")
            rn = F.col("__off") + F.col("__lrn")
            new_rows = (
                ranked.select("*", off_map[F.col("__bucket")].alias("__off"))
                .where(F.col("__off").isNotNull() & (rn <= capacity))
                .select(*ex["frontier_head"],
                        ex["new_depth"],
                        (F.lit(enqueued) - 1 + rn).alias("seq"),
                        F.lit(r).alias("round_added"),
                        ex["new_attempt"])
            )
            n_new = min(total, capacity)
        _t_discover = time.time()

        # --- next pending + seen/bloom appends -----------------------------
        # Finalize the PREVIOUS round here (await its writes — they had this
        # whole round's compute to overlap with — commit its manifest, free
        # caches retired two rounds back) before submitting this round's
        # state writes.
        self._finalize_prev()
        next_pending = deferred.select(*FRONTIER_COLS)
        if cfg.max_attempts > 1:
            retries = (
                docs.where(~final_attempt)
                .select("job_id", "url", "url_hash", "host", "depth", "seq",
                        (F.col("attempt") + 1).alias("attempt"))
                .join(pending.select("url_hash",
                                     F.col("origin").alias("__o"),
                                     F.col("path").alias("__p"),
                                     F.col("round_added").alias("__ra")),
                      "url_hash")
                .select("job_id", "url", "url_hash", "host",
                        F.col("__o").alias("origin"), F.col("__p").alias("path"),
                        "depth", "seq", F.col("__ra").alias("round_added"),
                        "attempt")
                .select(*FRONTIER_COLS)
            )
            next_pending = next_pending.unionByName(retries)
        if new_rows is not None and n_new > 0:
            if not cfg.politeness_budget and not cfg.batch_size \
                    and cfg.max_attempts == 1:
                # deferred is the schema-only empty frame here — skip the
                # union so next round's admitted is the cached new_rows
                # frame itself (depth-1 lineage for the pipelined pending)
                next_pending = new_rows
            else:
                next_pending = next_pending.unionByName(new_rows)
        state_writes = [writes.submit(self.catalog.append_round, next_pending, "pending", r)]
        # In-memory pending for the next round is only safe when its lineage
        # is one cached frame deep (unlimited budget, no batching, no
        # retries): with budgets/batches the deferred branch chains through
        # every prior round's frontier, so cut lineage by waiting for the
        # parquet write and reading it back (commit still deferred).
        pipeline_pending = (not cfg.politeness_budget and not cfg.batch_size
                            and cfg.max_attempts == 1)
        if not pipeline_pending:
            state_writes[0].result()
            next_pending = spark.read.schema(FRONTIER_SCHEMA).parquet(
                self.catalog.round_path("pending", r))
        compact_seen = False
        if n_new > 0:
            # seen compaction: the seen read unions every committed round's
            # directory, so an unbounded crawl pays O(rounds) listing/open
            # cost per round. Every K seen-writing rounds this round's write
            # holds the full cumulative hash set instead of the delta and
            # the manifest swap (atomic with the round commit) replaces the
            # delta chain — read cost stays O(1) directories. The Iceberg
            # deployment equivalent is snapshot compaction.
            compact_seen = (
                cfg.seen_compact_every > 0 and seen is not None
                and len(self.catalog.committed_rounds("seen"))
                + len(self._seen_uncommitted)
                >= cfg.seen_compact_every)
            if compact_seen:
                # synchronous: the NEXT round's anti-join reads this file
                # before its manifest commit lands (write pipelining)
                self.catalog.append_round(
                    seen.unionByName(new_rows.select("url_hash")), "seen", r)
                self._seen_uncommitted.append(
                    (r, self.catalog.round_path("seen", r), True))
            # incremental checkpoint: merge this round's delta into the
            # previous cumulative segment set ONCE, write it as round r.
            # Driver-resident filters (small crawls: the per-round delta is
            # bounded by the job's enqueue limit) collect the new hashes
            # once, build/merge the delta in numpy, and write BOTH the seen
            # delta and the cumulative bloom with pyarrow on the driver —
            # three Spark jobs per round (build_segments, seen write, bloom
            # write) become one collect. Deployment-size filters keep the
            # distributed build + applyInPandas merge + Spark writes.
            if driver_bloom:
                import pyarrow as pa

                hashes = [row["url_hash"]
                          for row in new_rows.select("url_hash").collect()]
                if not compact_seen:
                    self.catalog.append_round_local(
                        pa.table({"url_hash": pa.array(hashes,
                                                       type=pa.string())}),
                        "seen", r)
                    self._seen_uncommitted.append(
                        (r, self.catalog.round_path("seen", r), False))
                build_hashes = hashes
                if self._bloom_mem is None and seen is not None:
                    # prior bloom checkpoint missing/corrupt (filter_new
                    # degraded to the exact anti-join): REBUILD the
                    # cumulative filter from the seen history — committing
                    # a delta-only bitmap as 'cumulative' would bake in
                    # permanent false negatives for every pre-corruption
                    # URL. Bounded: driver-resident filters imply the zod
                    # limit cap on enqueued rows.
                    build_hashes = hashes + [
                        row["url_hash"]
                        for row in seen.select("url_hash").collect()]
                delta_mem = fam.build_driver(build_hashes)
                self._bloom_mem = fam.merge_driver(self._bloom_mem or {},
                                                   delta_mem)
                self.catalog.append_round_local(
                    pa.table({
                        "bucket": pa.array(sorted(self._bloom_mem),
                                           type=pa.int32()),
                        "bitmap": pa.array(
                            [self._bloom_mem[b]
                             for b in sorted(self._bloom_mem)],
                            type=pa.binary()),
                    }),
                    "bloom", r)
            else:
                # Deployment-size filters: seen delta + cumulative bloom are
                # written SYNCHRONOUSLY — the next round's bloom pre-filter
                # must include this round's URLs (a stale bloom's false
                # negatives would mark seen URLs definitely-new and enqueue
                # duplicates), and both files are read next round ahead of
                # their deferred manifest commit.
                if not compact_seen:
                    self.catalog.append_round(
                        new_rows.select("url_hash"), "seen", r)
                    self._seen_uncommitted.append(
                        (r, self.catalog.round_path("seen", r), False))
                delta = fam.build_segments(new_rows)
                if segments is not None:
                    cumulative = fam.merge_segments(delta.unionByName(segments))
                elif seen is not None:
                    # rebuild from the exact seen history (see driver path)
                    cumulative = fam.merge_segments(delta.unionByName(
                        fam.build_segments(seen)))
                else:
                    cumulative = delta
                self._bloom_mem = None
                self.catalog.append_round(cumulative, "bloom", r)
                self._bloom_uncommitted = (
                    r, self.catalog.round_path("bloom", r))
        # next-pending count by arithmetic over aggregates this round already
        # computed — no re-read of the just-written files (which cost a
        # footer-scan Spark job per round):
        #   pending(r)  = deferred + retries + newly enqueued
        #   deferred    = pending(r-1) - admitted      (budget/batch split)
        # pending(r-1) is the prior round's recorded pending_next (the seed
        # round records it as `enqueued` = seed count); legacy checkpoints
        # without either fall back to counting the read DataFrame.
        if outcome_fut is not None:
            outcome_rows = outcome_fut.result()
        outcome_counts = {(row["status"], row["final"]): row["count"]
                          for row in outcome_rows}
        n_fetched = sum(v for (s_, fin), v in outcome_counts.items()
                        if s_ == 200)
        n_failed = sum(v for (s_, fin), v in outcome_counts.items()
                       if s_ != 200 and fin)
        n_pending_prev = (known_pending if known_pending is not None
                          else pending.count())
        n_admitted = sum(outcome_counts.values())
        n_retries = 0
        if cfg.max_attempts > 1:
            n_retries = sum(v for (s_, fin), v in outcome_counts.items()
                            if s_ != 200 and not fin)
        n_pending_next = (n_pending_prev - n_admitted) + n_retries + n_new
        if self._bloom_mem is not None:
            # cumulative through this round whether or not a delta was added
            self._bloom_mem_round = r
        _t_writes = time.time()

        done = progress["done"] + n_fetched + n_failed
        failed = progress["failed"] + n_failed
        enqueued_total = enqueued + n_new
        finalized = n_pending_next == 0 or done >= cfg.limit
        # Seq range of next round's pending, by arithmetic: new rows carry
        # seq [enqueued, enqueued + n_new - 1]; deferred/retry rows keep
        # seqs within the prior range, so the union of ranges covers them.
        # Drives the next round's width_bucket bounds without waiting for
        # its outcome job (concurrent discovery materialization).
        prev_rng = progress.get("pending_seq_range")
        if n_new > 0:
            rng = [enqueued, enqueued + n_new - 1]
            if prev_rng is not None and (cfg.politeness_budget
                                         or cfg.batch_size
                                         or cfg.max_attempts > 1):
                rng = [min(prev_rng[0], rng[0]), max(prev_rng[1], rng[1])]
        else:
            rng = prev_rng
        meta = {
            "round": r, "done": done, "failed": failed,
            "enqueued": enqueued_total, "finalized": finalized,
            "admitted": n_fetched + n_failed, "new": n_new,
            "pending_next": n_pending_next, "phase": "crawl",
            "pending_seq_range": rng,
            # per-phase wall seconds (lineage/metrics; negligible cost).
            # Since the round-4 pipelining the outcome (fetch/extract) job
            # and the discovery checkpoint run CONCURRENTLY, so they share
            # one "compute" phase — attributing the old fetch_extract /
            # discover_enqueue split would misread plan-build time as work.
            "timings": {
                "compute": round(_t_discover - _t0, 3),
                "state_writes": round(_t_writes - _t_discover, 3),
                # compute sub-phases: plan = driver-side build + submits,
                # disc = the discovery checkpoint job (docs materialize),
                # counts = the per-bucket count collect
                "plan": round(_t_plan - _t0, 3),
                "disc": round((_t_ranked - _t_plan), 3)
                if disc_build is not None else 0.0,
                "counts": round((_t_counts - _t_ranked), 3)
                if disc_build is not None else 0.0,
            },
        }
        tables = ["pending", "results", "visits", "metrics"]
        # every bloom checkpoint is the full cumulative filter and only the
        # newest committed round is ever read (_latest_bloom), so each commit
        # retires the previous copy — otherwise an unbounded crawl stores
        # O(rounds) superseded full-filter copies
        replace = ["bloom"] if n_new > 0 else []
        if n_new > 0:
            tables += ["seen", "bloom"]
        if compact_seen:
            replace.append("seen")
        # Deferred commit (write pipelining): the manifest entry lands in
        # _finalize_prev() during the NEXT round, after the writes complete.
        # A crash before that resumes from the last committed round with
        # this round's directories dropped — exact-resume is unchanged.
        caches_now = [docs]
        if admitted_cached:
            caches_now.append(admitted)
        self._prev_inflight = {
            "round": r, "futures": pending_writes + state_writes,
            "tables": tables, "meta": meta, "replace": replace,
            "caches_now": caches_now,
            # ranked is the localCheckpointed block holder; keeping the
            # reference until the next finalize stops the ContextCleaner
            # from reclaiming blocks that in-flight writes still read
            # (unpersist on a checkpointed frame is a harmless no-op)
            "caches_later": [ranked] if ranked is not None else [],
        }
        self._pending_mem = next_pending
        return meta

    # -- reads for callers --------------------------------------------------
    def results(self) -> DataFrame | None:
        return self.catalog.read(self.spark, "results")

    def visits(self) -> DataFrame | None:
        return self.catalog.read(self.spark, "visits")

    def visit_order(self) -> DataFrame | None:
        v = self.visits()
        if v is None:
            return None
        # retry attempts reuse the original seq; the attempt tiebreak keeps
        # the order deterministic when max_attempts > 1
        return (v.select("round", "seq", "url", "depth", "status", "attempt")
                .orderBy("seq", "attempt").drop("attempt"))
