"""Crawl engine vs pure-Python simulator: visit order, seen membership,
limits, depth, strategies, globs, politeness budgets, robots, batch parity,
checkpoint resume (SURVEY.md §5.2 items 2-4)."""

import os

import pytest
from pyspark.sql import functions as F

from anycrawl_spark.crawl import CrawlConfig, CrawlEngine
from simulator import corpus_to_dict, key_of, simulate_crawl

SEED = "https://site000.test/p/0"


@pytest.fixture(scope="module")
def corpus_dict(small_corpus):
    return corpus_to_dict([r.asDict() for r in small_corpus.select("url", "html").collect()])


@pytest.fixture(scope="module")
def robots_dict(robots_df):
    return {r["host"]: list(r["disallow"]) for r in robots_df.collect()}


def run_engine(spark, corpus, tmp_root, name, robots=None, **cfg_kwargs):
    engine = CrawlEngine(spark, corpus, os.path.join(tmp_root, name), robots=robots)
    cfg = CrawlConfig(job_id=name, **cfg_kwargs)
    summary = engine.run(cfg)
    visits = [
        (r["seq"], r["url"], r["depth"], r["status"])
        for r in engine.visit_order().collect()
    ]
    seen = {r["url_hash"] for r in engine.catalog.read(spark, "seen").collect()}
    return engine, summary, visits, seen


def sim_visits(sim):
    return [(v.seq, v.url, v.depth, v.status) for v in sorted(sim.visits, key=lambda v: v.seq)]


def assert_parity(spark, visits, seen, sim):
    assert visits == sim_visits(sim)
    # seen set: engine stores sha256 of canonical; recompute from simulator
    import hashlib

    sim_hashes = {hashlib.sha256(k.encode()).hexdigest() for k in sim.seen}
    assert seen == sim_hashes


class TestCrawlParity:
    def test_bfs_same_hostname(self, spark, small_corpus, corpus_dict, tmp_root):
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=5, limit=40,
                  respect_robots=False)
        _, summary, visits, seen = run_engine(spark, small_corpus, tmp_root, "bfs", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-hostname",
                             max_depth=5, limit=40)
        assert_parity(spark, visits, seen, sim)
        assert summary["done"] == sim.done
        assert summary["enqueued"] == sim.enqueued

    def test_limit_enforced(self, spark, small_corpus, corpus_dict, tmp_root):
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=10, limit=12,
                  respect_robots=False)
        _, summary, visits, seen = run_engine(spark, small_corpus, tmp_root, "lim", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-hostname",
                             max_depth=10, limit=12)
        assert_parity(spark, visits, seen, sim)
        assert summary["enqueued"] <= 12
        assert summary["done"] <= 12

    def test_depth_cap(self, spark, small_corpus, corpus_dict, tmp_root):
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=1, limit=100,
                  respect_robots=False)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "depth", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-hostname",
                             max_depth=1, limit=100)
        assert_parity(spark, visits, seen, sim)
        assert max(v[2] for v in visits) <= 1

    def test_include_exclude_globs(self, spark, small_corpus, corpus_dict, tmp_root):
        inc, exc = ["**/p/*"], ["**/blog/**"]
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=6, limit=60,
                  include_paths=inc, exclude_paths=exc, respect_robots=False)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "glob", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-hostname", max_depth=6,
                             limit=60, include_paths=inc, exclude_paths=exc)
        assert_parity(spark, visits, seen, sim)
        assert all("/blog/" not in v[1] for v in visits[1:])

    def test_same_domain_crosses_subdomain(self, spark, small_corpus, corpus_dict, tmp_root):
        seed = "https://site003.test/p/0"
        kw = dict(seed_url=seed, strategy="same-domain", max_depth=4, limit=50,
                  respect_robots=False)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "dom", **kw)
        sim = simulate_crawl(corpus_dict, seed, strategy="same-domain",
                             max_depth=4, limit=50)
        assert_parity(spark, visits, seen, sim)
        hosts = {v[1].split("/")[2] for v in visits}
        # sub.site003.test is same-domain with site003.test
        assert any(h.startswith("sub.") for h in hosts) or len(hosts) == 1

    def test_all_strategy(self, spark, small_corpus, corpus_dict, tmp_root):
        kw = dict(seed_url=SEED, strategy="all", max_depth=3, limit=60,
                  respect_robots=False)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "all", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="all", max_depth=3, limit=60)
        assert_parity(spark, visits, seen, sim)

    def test_politeness_budget(self, spark, small_corpus, corpus_dict, tmp_root):
        kw = dict(seed_url=SEED, strategy="all", max_depth=4, limit=60,
                  politeness_budget=2, respect_robots=False)
        engine, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "budget", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="all", max_depth=4,
                             limit=60, politeness_budget=2)
        assert_parity(spark, visits, seen, sim)
        # invariant: per (round, host) fetch count ≤ budget
        per_round = (
            engine.visits().groupBy("round", "host").count().collect()
        )
        assert all(r["count"] <= 2 for r in per_round)

    def test_batch_size_coordinator_parity(self, spark, small_corpus, corpus_dict, tmp_root):
        # crawlCoordinator.ts:33-38 — batches of 5
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=5, limit=30,
                  batch_size=5, respect_robots=False)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "batch", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-hostname",
                             max_depth=5, limit=30, batch_size=5)
        assert_parity(spark, visits, seen, sim)

    def test_robots_enforced(self, spark, small_corpus, corpus_dict, robots_df,
                             robots_dict, tmp_root):
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=6, limit=60,
                  respect_robots=True)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root, "robots",
                                        robots=robots_df, **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-hostname",
                             max_depth=6, limit=60, robots=robots_dict)
        assert_parity(spark, visits, seen, sim)
        # site000.test denies /private (k=0 → k%3==0)
        assert all("/private/" not in v[1] for v in visits)

    def test_scrape_paths_gate(self, spark, small_corpus, corpus_dict, tmp_root):
        # visits cover everything; persisted results only match scrape_paths
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=5, limit=40,
                  scrape_paths=["**/blog/**"], respect_robots=False)
        engine, _, visits, _ = run_engine(spark, small_corpus, tmp_root, "spaths", **kw)
        results = engine.results()
        urls = [r["url"] for r in results.select("url").collect()]
        assert urls, "expected at least one /blog/ page in results"
        assert all("/blog/" in u for u in urls)
        assert any("/blog/" not in v[1] for v in visits)


class TestResume:
    def test_kill_and_resume_exact(self, spark, small_corpus, tmp_root):
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=5, limit=40,
                  respect_robots=False)

        # uninterrupted run
        full_dir = os.path.join(tmp_root, "resume_full")
        engine_full = CrawlEngine(spark, small_corpus, full_dir)
        engine_full.run(CrawlConfig(job_id="resume", **kw))
        full_visits = [
            (r["seq"], r["url"], r["depth"], r["status"])
            for r in engine_full.visit_order().collect()
        ]

        # killed after 2 rounds (max_rounds=2 simulates the kill), then resume
        part_dir = os.path.join(tmp_root, "resume_part")
        engine_part = CrawlEngine(spark, small_corpus, part_dir)
        engine_part.run(CrawlConfig(job_id="resume", max_rounds=2, **kw))
        # leave an uncommitted junk round behind to prove manifest hygiene
        junk = os.path.join(part_dir, "results", "round=99")
        os.makedirs(junk, exist_ok=True)
        with open(os.path.join(junk, "part-junk.parquet"), "w") as f:
            f.write("junk")

        engine_resumed = CrawlEngine(spark, small_corpus, part_dir)
        engine_resumed.run(CrawlConfig(job_id="resume", **kw), resume=True)
        resumed_visits = [
            (r["seq"], r["url"], r["depth"], r["status"])
            for r in engine_resumed.visit_order().collect()
        ]
        assert resumed_visits == full_visits

        full_results = {
            (r["url"], r["markdown"], r["text"])
            for r in engine_full.results().select("url", "markdown", "text").collect()
        }
        resumed_results = {
            (r["url"], r["markdown"], r["text"])
            for r in engine_resumed.results().select("url", "markdown", "text").collect()
        }
        assert resumed_results == full_results


class TestSeenCompaction:
    def test_compaction_preserves_crawl_and_bounds_dirs(self, spark, small_corpus,
                                                        tmp_root):
        """seen_compact_every=2 must crawl identically to the uncompacted
        run, keep the seen table content equal, and bound the number of
        committed seen round directories; resume across a compaction point
        stays exact."""
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=6,
                  limit=40, respect_robots=False)

        plain_dir = os.path.join(tmp_root, "seen_plain")
        plain = CrawlEngine(spark, small_corpus, plain_dir)
        plain.run(CrawlConfig(job_id="sc", seen_compact_every=0, **kw))
        plain_visits = [(r["seq"], r["url"]) for r in plain.visit_order().collect()]
        plain_seen = {r["url_hash"] for r in
                      plain.catalog.read(spark, "seen").collect()}

        comp_dir = os.path.join(tmp_root, "seen_comp")
        comp = CrawlEngine(spark, small_corpus, comp_dir)
        comp.run(CrawlConfig(job_id="sc", seen_compact_every=2, **kw))
        comp_visits = [(r["seq"], r["url"]) for r in comp.visit_order().collect()]
        comp_seen = {r["url_hash"] for r in
                     comp.catalog.read(spark, "seen").collect()}

        assert comp_visits == plain_visits
        assert comp_seen == plain_seen
        assert (len(comp.catalog.committed_rounds("seen"))
                <= 3 < len(plain.catalog.committed_rounds("seen")))
        # superseded delta directories were physically removed
        import glob as _glob

        on_disk = {int(p.rsplit("=", 1)[1]) for p in
                   _glob.glob(os.path.join(comp_dir, "seen", "round=*"))}
        assert on_disk == set(comp.catalog.committed_rounds("seen"))

        # resume across a compaction boundary reproduces the full crawl
        part_dir = os.path.join(tmp_root, "seen_comp_part")
        part = CrawlEngine(spark, small_corpus, part_dir)
        part.run(CrawlConfig(job_id="sc", seen_compact_every=2, max_rounds=3, **kw))
        resumed = CrawlEngine(spark, small_corpus, part_dir)
        resumed.run(CrawlConfig(job_id="sc", seen_compact_every=2, **kw),
                    resume=True)
        resumed_visits = [(r["seq"], r["url"])
                          for r in resumed.visit_order().collect()]
        assert resumed_visits == plain_visits


class TestExtractionParity:
    def test_byte_identical_text_vs_corpus_golden(self, spark, small_corpus, tmp_root):
        """The per-row invariant (input_hint): extracted text byte-equals the
        corpus golden `text` column for every fetched url."""
        engine, _, _, _ = run_engine(
            spark, small_corpus, tmp_root, "golden",
            seed_url=SEED, strategy="same-hostname", max_depth=6, limit=40,
            respect_robots=False)
        results = engine.results().where(F.col("status") == 200)
        joined = results.alias("r").join(
            small_corpus.alias("c"), F.col("r.url") == F.col("c.url"), "inner")
        n = joined.count()
        assert n > 0
        mismatches = joined.where(F.col("r.text") != F.col("c.text")).count()
        assert mismatches == 0


class TestRetries:
    def test_failed_fetch_retried_max_attempts(self, spark, small_corpus, tmp_root):
        """S5 retry semantics (Queue.ts:84-89): a URL missing from the corpus
        is attempted max_attempts times across rounds, then counted failed
        exactly once; successful fetches are never retried."""
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=2, limit=15,
                  max_attempts=3, respect_robots=False)
        engine = CrawlEngine(spark, small_corpus, os.path.join(tmp_root, "retry"))
        summary = engine.run(CrawlConfig(job_id="retry", **kw))
        visits = engine.visits().collect()
        by_url = {}
        for v in visits:
            by_url.setdefault(v["url"], []).append((v["attempt"], v["status"], v["round"]))
        # the "/" home link 404s → exactly 3 attempts, increasing rounds
        home = by_url.get("https://site000.test/")
        assert home is not None
        attempts = sorted(home)
        assert [a for a, _, _ in attempts] == [1, 2, 3]
        assert all(s == 404 for _, s, _ in attempts)
        rounds = [r for _, _, r in attempts]
        assert rounds == sorted(rounds) and len(set(rounds)) == 3
        # successes appear once
        ok_urls = [u for u, vs in by_url.items() if vs[0][1] == 200]
        assert all(len(by_url[u]) == 1 for u in ok_urls)
        # failure counted once in totals despite 3 visits
        n404_urls = len([u for u, vs in by_url.items() if all(s == 404 for _, s, _ in vs)])
        assert summary["failed"] == n404_urls


class TestAutoSaltGate:
    def test_resolve_salt_n(self):
        """'auto' salts only above the measured crossover; explicit values
        pass through; CrawlConfig validates the knob."""
        import pytest

        from anycrawl_spark.crawl import (CrawlConfig, SALT_FRONTIER_THRESHOLD,
                                          resolve_salt_n)

        assert resolve_salt_n("auto", None) == 0
        assert resolve_salt_n("auto", 10_000) == 0
        assert resolve_salt_n("auto", SALT_FRONTIER_THRESHOLD - 1) == 0
        assert resolve_salt_n("auto", SALT_FRONTIER_THRESHOLD) == 8
        assert resolve_salt_n(0, 10**9) == 0          # explicit wins
        assert resolve_salt_n(4, None) == 4
        CrawlConfig(job_id="j", seed_url="https://a.test/")  # default 'auto' ok
        with pytest.raises(ValueError):
            CrawlConfig(job_id="j", seed_url="https://a.test/",
                        budget_salt_n="always")
        with pytest.raises(ValueError):
            CrawlConfig(job_id="j", seed_url="https://a.test/",
                        budget_salt_n=-1)


class TestSaltedBudgetParity:
    def test_salted_budget_crawl_matches_simulator(self, spark, small_corpus,
                                                   corpus_dict, tmp_root):
        """budget_salt_n changes physical execution (two-stage top-k), never
        semantics: visit order and seen set still equal the simulator."""
        kw = dict(seed_url=SEED, strategy="all", max_depth=4, limit=60,
                  politeness_budget=2, budget_salt_n=4, respect_robots=False)
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root,
                                        "saltbudget", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="all", max_depth=4,
                             limit=60, politeness_budget=2)
        assert_parity(spark, visits, seen, sim)


class TestCombinedSemantics:
    def test_all_features_together(self, spark, small_corpus, corpus_dict,
                                   robots_df, robots_dict, tmp_root):
        """The north-rule scenario in one job: robots + politeness budget +
        globs + depth + limit simultaneously, exact order/membership parity."""
        inc, exc = [], ["**/blog/**"]
        kw = dict(seed_url=SEED, strategy="same-domain", max_depth=5, limit=45,
                  include_paths=inc, exclude_paths=exc, politeness_budget=3,
                  respect_robots=True)
        _, summary, visits, seen = run_engine(
            spark, small_corpus, tmp_root, "combo", robots=robots_df, **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-domain",
                             max_depth=5, limit=45, include_paths=inc,
                             exclude_paths=exc, politeness_budget=3,
                             robots=robots_dict)
        assert_parity(spark, visits, seen, sim)
        assert all("/private/" not in v[1] and "/blog/" not in v[1]
                   for v in visits[1:])
        assert summary["done"] == sim.done and summary["enqueued"] == sim.enqueued

    def test_everything_at_once(self, spark, small_corpus, corpus_dict,
                                robots_df, robots_dict, tmp_root):
        """Capstone: robots + DOMAIN-scoped salted budget + batch_size +
        include globs + depth + limit in one job — exact order/membership
        parity with the simulator under the full feature matrix."""
        inc = ["**/p/*"]
        kw = dict(seed_url=SEED, strategy="same-domain", max_depth=6,
                  limit=50, include_paths=inc, politeness_budget=2,
                  budget_scope="domain", budget_salt_n=4, batch_size=7,
                  respect_robots=True)
        _, summary, visits, seen = run_engine(
            spark, small_corpus, tmp_root, "capstone", robots=robots_df, **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="same-domain",
                             max_depth=6, limit=50, include_paths=inc,
                             politeness_budget=2, budget_scope="domain",
                             batch_size=7, robots=robots_dict)
        assert_parity(spark, visits, seen, sim)
        assert summary["done"] == sim.done and summary["enqueued"] == sim.enqueued


class TestFailureClasses:
    def test_per_class_retry_paths(self, spark, small_corpus, tmp_root):
        """F11 (EngineConfigurator.ts:584-708): with simulate_fetch_errors,
        corpus misses draw one of the five failure classes; retryable classes
        (blocked-with-status-text, proxy_error) get max_attempts tries while
        timeout/cloudflare/http_error fail fast on attempt 1."""
        from pyspark.sql import functions as F

        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=3, limit=40,
                  max_attempts=3, respect_robots=False, simulate_fetch_errors=True)
        engine = CrawlEngine(spark, small_corpus, os.path.join(tmp_root, "fclass"))
        engine.run(CrawlConfig(job_id="fclass", **kw))
        results = engine.results()
        failures = results.where(F.col("status") != 200).select(
            "url", "attempt", "failure_reason", "error_message").collect()
        assert failures, "fixture must contain corpus misses"
        classes = {f["failure_reason"] for f in failures}
        assert classes <= {"cloudflare_challenge", "blocked", "proxy_error",
                           "timeout", "http_error"}
        visits = engine.visits().collect()
        attempts_by_url = {}
        for v in visits:
            attempts_by_url.setdefault(v["url"], []).append(v["attempt"])
        for f in failures:
            tries = sorted(attempts_by_url[f["url"]])
            if f["failure_reason"] in ("blocked", "proxy_error"):
                # retryable: exactly max_attempts tries
                assert tries == [1, 2, 3], (f["url"], f["failure_reason"], tries)
            else:
                # fail-fast classes: single attempt
                assert tries == [1], (f["url"], f["failure_reason"], tries)

    def test_classifier_precedence(self):
        from anycrawl_spark.errors import failure_reason, should_retry

        assert failure_reason("cloudflare says no") == "cloudflare_challenge"
        assert failure_reason("saw CF_RAY header") == "cloudflare_challenge"
        # 403 inside a proxy/timeout message: blocked wins (precedence)
        assert failure_reason("proxy timeout after 403") == "blocked"
        assert failure_reason("ERR_NEED_TO_RETRY") == "proxy_error"
        assert failure_reason("lowercase proxy issue") == "proxy_error"
        assert failure_reason("Navigation TIMEOUT") == "timeout"
        assert failure_reason("boom", error_name="TimeoutError") == "timeout"
        assert failure_reason("HTTP 500") == "http_error"
        # retry table
        assert should_retry("ANYCRAWL_PROXY_ACTION_ROTATE_PROXY")
        assert should_retry("Received blocked status code: 403")
        assert not should_retry("request blocked by origin")  # plain blocked
        assert should_retry("ERR_SOCKS_CONNECTION_FAILED")
        assert not should_retry("timeout of 30s", error_name="TimeoutError")
        assert not should_retry("HTTP 500")


class TestCancellation:
    def test_cancel_between_rounds_then_resume(self, spark, small_corpus,
                                               corpus_dict, tmp_root):
        """Progress.cancel parity: a cancelled job finalizes immediately
        without admitting more rounds; clearing the flag and resuming
        completes the crawl identically to an uninterrupted run."""
        kw = dict(seed_url=SEED, strategy="all", max_depth=4, limit=60,
                  respect_robots=False)

        ref = CrawlEngine(spark, small_corpus, os.path.join(tmp_root, "cx_ref"))
        ref.run(CrawlConfig(job_id="cx", **kw))
        ref_visits = sorted((v["seq"], v["url"]) for v in ref.visits().collect())

        eng = CrawlEngine(spark, small_corpus, os.path.join(tmp_root, "cx"))
        # stop after two rounds mid-crawl, then cancel
        eng.run(CrawlConfig(job_id="cx", max_rounds=2, **kw))
        eng.cancel()
        summary = eng.run(CrawlConfig(job_id="cx", **kw), resume=True)
        assert summary["done"] < 60  # finalized early, nothing more admitted
        meta = eng.catalog.round_meta(summary["rounds"])
        assert meta.get("cancelled") and meta.get("finalized")
        # uncancel + resume completes and matches the uninterrupted run
        eng.uncancel()
        eng.run(CrawlConfig(job_id="cx", **kw), resume=True)
        got = sorted((v["seq"], v["url"]) for v in eng.visits().collect())
        assert got == ref_visits


class TestDomainBudget:
    def test_domain_budget_crawl_matches_simulator(self, spark, small_corpus,
                                                   corpus_dict, tmp_root):
        """North rule 'per-domain politeness budgets': subdomains share one
        budget (fixture hosts include sub.siteNNN.test); engine matches the
        simulator under the same scope."""
        kw = dict(seed_url=SEED, strategy="all", max_depth=4, limit=60,
                  politeness_budget=2, respect_robots=False,
                  budget_scope="domain")
        _, _, visits, seen = run_engine(spark, small_corpus, tmp_root,
                                        "dombudget", **kw)
        sim = simulate_crawl(corpus_dict, SEED, strategy="all", max_depth=4,
                             limit=60, politeness_budget=2,
                             budget_scope="domain")
        assert_parity(spark, visits, seen, sim)

    def test_subdomains_share_budget(self, spark):
        from pyspark.sql import functions as F

        from anycrawl_spark.politeness import apply_host_budget

        rows = [("https://a.site.test/%d" % i, "a.site.test", 0, i)
                for i in range(3)]
        rows += [("https://b.site.test/%d" % i, "b.site.test", 0, 10 + i)
                 for i in range(3)]
        rows += [("https://other.test/%d" % i, "other.test", 0, 20 + i)
                 for i in range(3)]
        df = spark.createDataFrame(
            rows, "url string, host string, depth int, seq long")
        adm_host, _ = apply_host_budget(df, 2, scope="host")
        assert adm_host.count() == 6  # 2 per hostname
        adm_dom, _ = apply_host_budget(df, 2, scope="domain")
        got = sorted(r["url"] for r in adm_dom.collect())
        # site.test domain: only the 2 lowest-seq rows across BOTH subdomains
        assert got == ["https://a.site.test/0", "https://a.site.test/1",
                       "https://other.test/0", "https://other.test/1"]


class TestSpecRobotsCrawl:
    def test_crawl_with_wildcard_robots(self, spark, small_corpus, tmp_root):
        """Engine accepts raw robots.txt with wildcard/Allow rules: the
        blog subtree is disallowed via '/blog*' but '/blog/p/3' is re-allowed
        by a longer Allow rule; visited set reflects both."""
        from anycrawl_spark.politeness import robots_rules_from_texts

        txt = (
            "User-agent: anycrawl\n"
            "Disallow: /blog*\n"
            "Allow: /blog/p/3\n"
            "Disallow: /*.png$\n"
        )
        robots = robots_rules_from_texts(
            spark, {"site000.test": txt}, user_agent="anycrawl")
        engine = CrawlEngine(spark, small_corpus,
                             os.path.join(tmp_root, "specrb"), robots=robots)
        engine.run(CrawlConfig(job_id="specrb", seed_url=SEED,
                               strategy="same-hostname", max_depth=6,
                               limit=80, respect_robots=True))
        paths = {v["url"].split(".test", 1)[1] for v in engine.visits().collect()}
        blog_paths = {p for p in paths if p.startswith("/blog")}
        # Allow '/blog/p/3' is a PREFIX rule (RFC): /blog/p/3, /blog/p/38 and
        # the ?query variant are re-allowed; every other blog path is denied
        assert blog_paths and all(p.startswith("/blog/p/3") for p in blog_paths), blog_paths
        assert "/blog/p/10" not in paths  # reachable but robots-denied
        assert not any(p.endswith(".png") for p in paths)
        assert any(p.startswith("/p/") for p in paths)  # rest still crawled


class TestConfigBounds:
    def test_zod_schema_bounds(self):
        """CrawlConfig enforces the reference zod bounds
        (CrawlSchema.ts:31-47): max_depth [1,50], limit [1,50000], strategy
        enum — zod .parse() rejects out-of-range, so does the dataclass."""
        import pytest

        CrawlConfig(job_id="b", seed_url="https://x.test/",
                    max_depth=50, limit=50_000)  # boundary values accepted
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/", max_depth=0)
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/", max_depth=51)
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/", limit=0)
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/", limit=50_001)

    def test_seed_url_must_be_absolute_http(self):
        """z.string().url() rejects non-URL seeds; a scheme-less seed would
        canonicalize to a null-host junk row and 'complete' a crawl of
        nothing."""
        import pytest

        for bad in ("x.test/foo", "ftp://x.test/", "", "https://"):
            with pytest.raises(ValueError):
                CrawlConfig(job_id="b", seed_url=bad)
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/", max_attempts=0)

    def test_resume_rejects_bloom_geometry_change(self, spark, small_corpus,
                                                  tmp_root):
        import pytest

        ckpt = os.path.join(tmp_root, "geom")
        engine = CrawlEngine(spark, small_corpus, ckpt)
        engine.run(CrawlConfig(job_id="g", seed_url=SEED,
                               strategy="same-hostname", max_depth=2,
                               limit=10, respect_robots=False, max_rounds=1))
        resumed = CrawlEngine(spark, small_corpus, ckpt)
        with pytest.raises(ValueError, match="bloom geometry"):
            resumed.run(CrawlConfig(job_id="g", seed_url=SEED,
                                    strategy="same-hostname", max_depth=2,
                                    limit=10, respect_robots=False,
                                    bloom_m_bits=1 << 16), resume=True)


class TestCorpusDedup:
    def test_duplicate_captures_do_not_fan_out(self, spark, small_corpus,
                                               tmp_root):
        """Two captures of the same URL in the corpus must not duplicate
        visits/results or corrupt the done/pending arithmetic — the latest
        warc_ts capture wins."""
        dup = small_corpus.limit(20).withColumn(
            "warc_ts", F.col("warc_ts") - F.expr("INTERVAL 1 DAY"))
        doubled = small_corpus.unionByName(dup)

        base_dir = os.path.join(tmp_root, "dedup_base")
        base = CrawlEngine(spark, small_corpus, base_dir)
        s1 = base.run(CrawlConfig(job_id="d", seed_url=SEED,
                                  strategy="same-hostname", max_depth=4,
                                  limit=30, respect_robots=False))
        dbl_dir = os.path.join(tmp_root, "dedup_dbl")
        dbl = CrawlEngine(spark, doubled, dbl_dir)
        s2 = dbl.run(CrawlConfig(job_id="d", seed_url=SEED,
                                 strategy="same-hostname", max_depth=4,
                                 limit=30, respect_robots=False))
        assert (s1["done"], s1["fetched"], s1["enqueued"]) == \
               (s2["done"], s2["fetched"], s2["enqueued"])
        v1 = [(r["seq"], r["url"]) for r in base.visit_order().collect()]
        v2 = [(r["seq"], r["url"]) for r in dbl.visit_order().collect()]
        assert v1 == v2
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/",
                        strategy="same-planet")
        with pytest.raises(ValueError):
            CrawlConfig(job_id="b", seed_url="https://x.test/",
                        budget_scope="continent")


class TestPipelinedCheckpointing:
    """Regression tests for the round-4 write pipelining: deferred commits,
    back-to-back seen compaction over in-flight files, and resume from a
    checkpoint whose newest round's writes landed but whose manifest commit
    never did (the crash window pipelining introduces)."""

    def test_compact_every_round_matches_default(self, spark, small_corpus, tmp_root):
        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=5,
                  limit=40, respect_robots=False)

        base_dir = os.path.join(tmp_root, "pc_base")
        engine_base = CrawlEngine(spark, small_corpus, base_dir)
        engine_base.run(CrawlConfig(job_id="pc", **kw))
        base_visits = [(r["seq"], r["url"]) for r in
                       engine_base.visit_order().collect()]

        # seen_compact_every=1: every seen-writing round compacts; the
        # compaction write reads the PREVIOUS round's uncommitted compacted
        # file after the prior commit deleted the superseded delta dirs —
        # this crashed with FileNotFound before _read_seen learned to drop
        # superseded rounds from the plan.
        c_dir = os.path.join(tmp_root, "pc_compact1")
        engine_c = CrawlEngine(spark, small_corpus, c_dir)
        engine_c.run(CrawlConfig(job_id="pc", seen_compact_every=1, **kw))
        c_visits = [(r["seq"], r["url"]) for r in
                    engine_c.visit_order().collect()]
        assert c_visits == base_visits
        # compaction keeps the committed seen table at one directory
        assert len(engine_c.catalog.committed_rounds("seen")) == 1

    def test_resume_after_uncommitted_tail(self, spark, small_corpus, tmp_root):
        import json
        import shutil

        kw = dict(seed_url=SEED, strategy="same-hostname", max_depth=5,
                  limit=40, respect_robots=False)

        full_dir = os.path.join(tmp_root, "pc_full")
        engine_full = CrawlEngine(spark, small_corpus, full_dir)
        engine_full.run(CrawlConfig(job_id="pc", **kw))
        full_visits = [(r["seq"], r["url"], r["depth"], r["status"]) for r in
                       engine_full.visit_order().collect()]

        # simulate the pipelining crash window: round N's files are on disk
        # but its manifest commit never happened — rewind the manifest by
        # one round and leave the directories in place
        part_dir = os.path.join(tmp_root, "pc_part")
        engine_part = CrawlEngine(spark, small_corpus, part_dir)
        engine_part.run(CrawlConfig(job_id="pc", **kw))
        mpath = os.path.join(part_dir, "_manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        last = max(int(k) for k in manifest["meta"])
        victims = [r for r in range(last - 1, last + 1)]  # drop final 2 rounds
        for table, rounds in manifest["tables"].items():
            manifest["tables"][table] = [r for r in rounds if r not in victims]
        for v in victims:
            manifest["meta"].pop(str(v), None)
        with open(mpath, "w") as f:
            json.dump(manifest, f)

        engine_resumed = CrawlEngine(spark, small_corpus, part_dir)
        engine_resumed.run(CrawlConfig(job_id="pc", **kw), resume=True)
        resumed_visits = [(r["seq"], r["url"], r["depth"], r["status"]) for r in
                          engine_resumed.visit_order().collect()]
        assert resumed_visits == full_visits

    def test_run_failure_releases_executor(self, spark, small_corpus, tmp_root):
        # resume-validation failure path: executor must not leak
        d = os.path.join(tmp_root, "pc_geom")
        engine = CrawlEngine(spark, small_corpus, d)
        engine.run(CrawlConfig(job_id="pc", seed_url=SEED, limit=5,
                               respect_robots=False))
        engine2 = CrawlEngine(spark, small_corpus, d)
        with pytest.raises(ValueError, match="bloom geometry"):
            engine2.run(CrawlConfig(job_id="pc", seed_url=SEED, limit=5,
                                    respect_robots=False,
                                    bloom_num_buckets=8), resume=True)
        assert engine2._writes is None


class TestRecrawlEviction:
    """TTL eviction → re-enqueue → recrawl round trip (the cuckoo.py
    deployment story): a page-cache entry passes its TTL tier, the monitor
    evicts the URL from the seen structures (true deletion on the cuckoo
    family; rebuild-from-exact-seen on bloom) and re-enqueues it, and a
    resumed run fetches exactly those URLs again with dense visit
    numbering intact and every rediscovered link still deduped."""

    @pytest.mark.parametrize("fam_name", ["cuckoo", "bloom"])
    def test_cache_expiry_roundtrip(self, spark, small_corpus, tmp_root,
                                    fam_name):
        from anycrawl_spark.cache import cache_lookup

        kw = dict(seed_url=SEED, strategy="all", max_depth=4, limit=40,
                  respect_robots=False, seen_filter=fam_name)
        eng = CrawlEngine(spark, small_corpus,
                          os.path.join(tmp_root, f"recrawl_{fam_name}"))
        s1 = eng.run(CrawlConfig(job_id="rc", **kw))
        visits1 = eng.visits().collect()
        ok_urls = sorted(v["url"] for v in visits1 if v["status"] == 200)
        victims = ok_urls[1:4]          # 3 pages whose cache entries expire

        # --- cache-TTL wiring: victims scraped 3 days ago (page tier = 2d)
        cache = spark.createDataFrame(
            [(v["url_hash"], "h0", "md", "tx", "t",)
             for v in visits1 if v["status"] == 200],
            "url_hash string, options_hash string, markdown string, "
            "text string, title string",
        ).withColumn(
            "scraped_at",
            F.when(F.col("url_hash").isin(
                [v["url_hash"] for v in visits1 if v["url"] in victims]),
                F.expr("current_timestamp() - INTERVAL 3 DAY"))
            .otherwise(F.expr("current_timestamp()")))
        frontier = spark.createDataFrame(
            [(v["url"], v["url_hash"]) for v in visits1
             if v["status"] == 200], "url string, url_hash string")
        looked = cache_lookup(frontier, cache, "h0", tier="page")
        expired = sorted(r["url"] for r in looked
                         .where(~F.col("cache_hit")).collect())
        assert expired == sorted(victims)   # page-tier TTL flags exactly them

        # --- evict: seen state loses exactly the victim hashes. A never-
        # crawled URL in the batch must NOT be deleted (cuckoo deletion of
        # a non-member could zero a colliding member's only fingerprint),
        # and a mismatched filter geometry must be rejected before any
        # state is touched (the resume guard, applied to eviction too).
        cfg = CrawlConfig(job_id="rc", **kw)
        with pytest.raises(ValueError, match="geometry mismatch"):
            eng.evict_urls(CrawlConfig(job_id="rc", **{
                **kw, "bloom_num_buckets": 8}), expired)
        meta_e = eng.evict_urls(
            cfg, expired + ["https://never-crawled.test/x"])
        assert meta_e["evicted"] == 3
        assert meta_e["filter_deletion"] is (fam_name == "cuckoo")
        victim_hashes = {v["url_hash"] for v in visits1
                         if v["url"] in victims}
        seen_now = {r["url_hash"] for r in eng.catalog.read(
            spark, "seen").select("url_hash").collect()}
        assert victim_hashes.isdisjoint(seen_now)
        assert len(seen_now) == s1["enqueued"] - 3
        # the amended filter + exact seen treat victims as new again
        fam = cfg.filter_family()
        cand = eng._canonical_rows(cfg, expired)
        cand_df = spark.createDataFrame(cand)
        segs = eng._latest_bloom(spark, meta_e["round"])
        fresh = fam.filter_new(cand_df, segs,
                               eng.catalog.read(spark, "seen"))
        assert {r["url_hash"] for r in fresh.collect()} == victim_hashes

        # --- re-enqueue + resumed run fetches exactly the victims again
        meta_q = eng.reenqueue_urls(cfg, expired)
        assert meta_q["pending_next"] == 3
        assert meta_q["enqueued"] == s1["enqueued"] + 3
        s2 = eng.run(CrawlConfig(job_id="rc", **{**kw, "limit": 43}),
                     resume=True)
        assert s2["done"] == s1["done"] + 3
        # rediscovered links all dedupe: nothing new enqueued beyond the 3
        assert s2["enqueued"] == s1["enqueued"] + 3

        visits2 = eng.visits().collect()
        counts = {}
        for v in visits2:
            counts[v["url"]] = counts.get(v["url"], 0) + 1
        assert all(counts[u] == 2 for u in victims)
        assert all(n == 1 for u, n in counts.items() if u not in victims)
        seqs = sorted(v["seq"] for v in visits2)
        assert seqs == list(range(s2["done"]))   # dense numbering intact

        # seen state is whole again: victims re-marked at enqueue
        seen_after = {r["url_hash"] for r in eng.catalog.read(
            spark, "seen").select("url_hash").collect()}
        assert victim_hashes <= seen_after


class TestPrefilterGate:
    def test_gate_never_changes_results(self, spark, small_corpus, tmp_root):
        """prefilter_min_seen gates only the physical plan (probe vs plain
        exact anti-join) — visit order, statuses, and the seen set must be
        byte-identical on both sides of the threshold."""
        runs = {}
        for tag, threshold in (("probe", 0), ("exact", 1 << 30)):
            eng = CrawlEngine(spark, small_corpus,
                              os.path.join(tmp_root, f"pf_{tag}"))
            eng.run(CrawlConfig(job_id="pf", seed_url=SEED, strategy="all",
                                max_depth=6, limit=60, respect_robots=False,
                                prefilter_min_seen=threshold))
            runs[tag] = (
                [(r["seq"], r["url"], r["status"])
                 for r in eng.visit_order().collect()],
                sorted(r["url_hash"] for r in
                       eng.catalog.read(spark, "seen").collect()),
            )
        assert runs["probe"] == runs["exact"]


class TestResolvedProxyField:
    """Base.ts:1294-1295: every result document reports the resolved proxy
    mode name (getResolvedProxyModeName over the request's proxy option)."""

    def test_default_is_base(self, spark, small_corpus, tmp_root):
        engine, _, _, _ = run_engine(
            spark, small_corpus, tmp_root, "pxdef", seed_url=SEED,
            strategy="same-hostname", max_depth=2, limit=5,
            respect_robots=False)
        modes = {r["proxy"] for r in engine.results().select("proxy").collect()}
        assert modes == {"base"}

    def test_stealth_needs_pool_else_degrades(self, spark, small_corpus,
                                              tmp_root, monkeypatch):
        monkeypatch.delenv("ANYCRAWL_PROXY_STEALTH_URL", raising=False)
        engine, _, _, _ = run_engine(
            spark, small_corpus, tmp_root, "pxdeg", seed_url=SEED,
            strategy="same-hostname", max_depth=2, limit=5,
            respect_robots=False, proxy="stealth")
        modes = {r["proxy"] for r in engine.results().select("proxy").collect()}
        assert modes == {"base"}  # libs/proxy.ts:60-63 degradation

        monkeypatch.setenv("ANYCRAWL_PROXY_STEALTH_URL", "http://st:9090")
        engine2, _, _, _ = run_engine(
            spark, small_corpus, tmp_root, "pxst", seed_url=SEED,
            strategy="same-hostname", max_depth=2, limit=5,
            respect_robots=False, proxy="stealth")
        modes = {r["proxy"]
                 for r in engine2.results().select("proxy").collect()}
        assert modes == {"stealth"}

    def test_custom_url_and_auto(self, spark, small_corpus, tmp_root):
        engine, _, _, _ = run_engine(
            spark, small_corpus, tmp_root, "pxcust", seed_url=SEED,
            strategy="same-hostname", max_depth=2, limit=5,
            respect_robots=False, proxy="http://me:3128")
        modes = {r["proxy"] for r in engine.results().select("proxy").collect()}
        assert modes == {"custom"}
        engine2, _, _, _ = run_engine(
            spark, small_corpus, tmp_root, "pxauto", seed_url=SEED,
            strategy="same-hostname", max_depth=2, limit=5,
            respect_robots=False, proxy="auto")
        modes = {r["proxy"]
                 for r in engine2.results().select("proxy").collect()}
        assert modes == {"base"}  # auto charges/reports base initially


class TestPageCacheE2E:
    """Crawl results -> write-side gate + key derivation -> page-cache
    upsert -> read-side lookup: the full S8 story (Worker save step ->
    cache/index.ts -> managers/Cache.ts) composed over a real engine
    run."""

    def test_results_to_cache_roundtrip(self, spark, small_corpus, tmp_root):
        from anycrawl_spark.cache import (build_page_cache, cache_lookup,
                                          compute_cache_key,
                                          normalize_cache_url)

        engine, summary, _, _ = run_engine(
            spark, small_corpus, tmp_root, "cache_e2e", seed_url=SEED,
            strategy="same-hostname", max_depth=5, limit=30,
            respect_robots=False)
        results = engine.results()
        # inject one title-only result the gate must refuse, and one
        # failed fetch it must never consider
        extra = spark.createDataFrame(
            [("cache_e2e", "https://site000.test/only-title", 200,
              "Only Title", "Only Title", None, None, "base"),
             ("cache_e2e", "https://site000.test/failed", 503,
              "x", "body", None, None, "base")],
            "job_id string, url string, status int, markdown string, "
            "title string, text string, html_clean string, proxy string")
        results = results.unionByName(extra, allowMissingColumns=True)

        cache = build_page_cache(
            results, engine="cheerio", formats=("markdown",),
            proxy="auto",   # the job's ORIGINAL requested proxy, not the
                            # per-row resolved mode (Base.ts:1206)
            scraped_at_expr="timestamp'2026-01-02 03:04:05'")
        rows = {r["url"]: r for r in cache.collect()}

        ok = [r for r in results.where("status = 200").collect()
              if r["url"] != "https://site000.test/only-title"]
        assert len(ok) > 0
        # the gate admits every real page, refuses the title-only and the
        # failed fetch
        assert set(rows) == {r["url"] for r in ok}
        # keys match the exact-parity Python computeCacheKey
        probe = ok[0]
        uh, oh = compute_cache_key({
            "url": probe["url"], "engine": "cheerio",
            "formats": ["markdown"], "proxy": "auto"})
        got = rows[probe["url"]]
        assert (got["url_hash"], got["options_hash"]) == (uh, oh)
        assert got["markdown"] == probe["markdown"]

        # read-side roundtrip: a frontier keyed by the cache's own url
        # hash finds every stored page fresh
        frontier = (results.where("status = 200")
                    .select("url").distinct()
                    .withColumn("url_hash", F.sha2(
                        F.udf(normalize_cache_url, "string")("url"), 256)))
        hits = cache_lookup(
            frontier, cache, oh,
            now_expr="timestamp'2026-01-02 04:00:00'")
        hit_map = {r["url"]: r for r in hits.collect()}
        assert all(hit_map[r["url"]]["cache_hit"] for r in ok)
        assert not hit_map["https://site000.test/only-title"]["cache_hit"] \
            if "https://site000.test/only-title" in hit_map else True
        # and an upsert of a re-scrape wins over the stale entry
        rescrape = results.where(F.col("url") == probe["url"]).withColumn(
            "markdown", F.lit("# fresher"))
        cache2 = build_page_cache(
            rescrape, engine="cheerio", formats=("markdown",),
            proxy="auto",
            scraped_at_expr="timestamp'2026-01-03 00:00:00'",
            existing=cache)
        newest = cache2.where(F.col("url") == probe["url"]).collect()
        assert len(newest) == 1 and newest[0]["markdown"] == "# fresher"
