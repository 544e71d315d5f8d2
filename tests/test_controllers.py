"""v1 controller response assembly (anycrawl_spark/controllers.py).

The distributed paths are oracled via operators/queries.py::
{crawl_results_page, task_executions_page, job_cancel_gate}; these cover
the envelope edge cases the arithmetic fixtures can't synthesize —
uppercase-hex uuids through the zod pattern, the exact skip-coercion
table from CrawlController.ts:297-298, owner-precedence corner cases
(OwnerAccess.ts:7-17), and the pagination default legs (pagination.ts).
"""

import pytest
from pyspark.sql import functions as F

from anycrawl_spark.controllers import (
    browser_runtime_for_cache,
    crawl_results_page,
    job_cancel_gate,
    resolve_wait_timeout_ms,
    should_check_cache,
    task_executions_page,
)


class TestScrapeWaitTimeout:
    """ScrapeController.ts:16-39 resolveWaitTimeoutMs."""

    def test_explicit_timeout_wins_everywhere(self):
        for mode in ("auto", "stealth", "base", ""):
            opts = {"proxy": mode, "timeout": 4500.7}
            assert resolve_wait_timeout_ms(opts, True) == 4500  # floored

    def test_explicit_requires_key_presence(self):
        # hasExplicitTimeout=false ignores the value entirely
        assert resolve_wait_timeout_ms({"timeout": 4500}, False) == 60_000

    def test_invalid_explicit_falls_through(self):
        for bad in (0, -5, None, "abc", float("nan"), float("inf")):
            assert resolve_wait_timeout_ms(
                {"timeout": bad, "proxy": "auto"}, True) == 120_000

    def test_stealth_modes_use_stealth_default(self):
        assert resolve_wait_timeout_ms({"proxy": "auto"}, False) == 120_000
        assert resolve_wait_timeout_ms(
            {"proxy": "stealth"}, False) == 120_000
        assert resolve_wait_timeout_ms({"proxy": "base"}, False) == 60_000
        assert resolve_wait_timeout_ms({}, False) == 60_000
        assert resolve_wait_timeout_ms(None, False) == 60_000
        # non-string proxy (e.g. a config object) -> '' -> base leg
        assert resolve_wait_timeout_ms(
            {"proxy": {"url": "x"}}, False) == 60_000

    def test_stealth_env_parseint_leg(self):
        env = "90000ms"   # parseInt takes the leading digits
        assert resolve_wait_timeout_ms(
            {"proxy": "auto"}, False, stealth_timeout_env=env) == 90_000
        for bad in ("", "abc", "0", "-5"):
            assert resolve_wait_timeout_ms(
                {"proxy": "auto"}, False,
                stealth_timeout_env=bad) == 120_000


class TestCacheGates:
    def test_browser_runtime(self):
        assert browser_runtime_for_cache("playwright") == "cloakbrowser"
        assert browser_runtime_for_cache("puppeteer") == "cloakbrowser"
        assert browser_runtime_for_cache("cheerio") is None
        assert browser_runtime_for_cache(None) is None

    def test_should_check_cache(self):
        # absent max_age (undefined) consults the cache; 0 forces fresh
        assert should_check_cache(True, False, None)
        assert should_check_cache(True, False, 3600)
        assert not should_check_cache(True, False, 0)
        assert not should_check_cache(True, True, None)     # template skips
        assert not should_check_cache(False, False, None)   # disabled


def _uuid(n: int) -> str:
    return "00000000-0000-4000-8000-%012d" % n


@pytest.fixture(scope="module")
def results_fixture(spark):
    jobs = spark.createDataFrame(
        [(_uuid(0), "scraping", None, 5, None),
         (_uuid(1), "completed", 500, None, 7),
         (_uuid(2).upper(), "pending", None, None, None)],
        "job_id string, status string, total long, completed long, "
        "credits_used long")
    results = spark.createDataFrame(
        [(_uuid(0), i, f"https://s.test/p/{i}",
          f"s{i}.png" if i % 3 == 0 else None,
          f"f{i}.png" if i % 7 == 0 else None) for i in range(130)],
        "job_id string, seq long, url string, screenshot string, "
        "screenshot_full string")
    return jobs, results


def _page(spark, fixture, rows):
    jobs, results = fixture
    req = spark.createDataFrame(
        rows, "req_id string, job_id_raw string, skip_raw string")
    out = crawl_results_page(jobs, results, req)
    return {r["req_id"]: r.asDict() for r in out.collect()}


class TestResultsSkipCoercion:
    """Math.max(0, Number(rawSkip ?? 0) || 0) over the query-string
    domain (CrawlController.ts:297-298)."""

    @pytest.mark.parametrize("raw,count,next_skip", [
        (None, 100, 100),    # absent -> ?? 0
        ("", 100, 100),      # Number('') = 0
        ("  ", 100, 100),    # Number('  ') = 0 (trimmed)
        ("abc", 100, 100),   # NaN -> || 0
        ("-25", 100, 100),   # negative -> Math.max clamp
        ("100", 30, None),   # tail page, no next
        (" 15 ", 100, 115),  # whitespace-tolerant numeric
        ("1e2", 30, None),   # scientific notation parses
        ("130", 0, None),    # exactly at the end
        ("500", 0, None),    # past the end: 500 + 0 < 130 is false
    ])
    def test_skip(self, spark, results_fixture, raw, count, next_skip):
        got = _page(spark, results_fixture,
                    [("r", _uuid(0), raw)])["r"]
        assert got["http_status"] == 200
        assert got["page_count"] == count
        if next_skip is None:
            assert got["next_url"] is None
        else:
            assert got["next_url"].endswith(f"/results?skip={next_skip}")


class TestResultsEnvelope:
    def test_fallbacks_null_job_fields(self, spark, results_fixture):
        # job.total ?? actual-count, completed ?? 0, creditsUsed ?? 0
        got = _page(spark, results_fixture, [("r", _uuid(0), None)])["r"]
        assert (got["total"], got["completed"], got["credits_used"]) == \
            (130, 5, 0)

    def test_job_fields_win_when_set(self, spark, results_fixture):
        got = _page(spark, results_fixture, [("r", _uuid(1), None)])["r"]
        assert (got["total"], got["completed"], got["credits_used"]) == \
            (500, 0, 7)
        assert got["page_count"] == 0 and got["next_url"] is None

    def test_uppercase_hex_uuid_passes_zod(self, spark, results_fixture):
        # z.string().uuid() accepts any-case hex
        got = _page(spark, results_fixture,
                    [("r", _uuid(2).upper(), None)])["r"]
        assert got["http_status"] == 200

    def test_invalid_and_missing_are_400(self, spark, results_fixture):
        got = _page(spark, results_fixture,
                    [("a", "1234", None), ("b", _uuid(9), None)])
        assert got["a"]["http_status"] == 400
        assert got["a"]["error"] == "Invalid job ID"
        assert got["b"]["http_status"] == 400
        assert got["b"]["error"] == "Not found"

    def test_screenshot_prefixing(self, spark, results_fixture):
        jobs, results = results_fixture
        req = spark.createDataFrame(
            [("r", _uuid(0), None)],
            "req_id string, job_id_raw string, skip_raw string")
        base = "https://files.test"
        got = crawl_results_page(jobs, results, req, base=base).collect()[0]
        # rows 0..99: screenshots at seq%3==0 (34), fullpage at %7==0 (15)
        assert got["screenshots_prefixed"] == 49
        assert got["next_url"].startswith(base + "/v1/crawl/")


class TestExecutionsPage:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        tasks = spark.createDataFrame(
            [("task-0", "u1", "k1"), ("task-1", None, "k2")],
            "task_uuid string, user_id string, api_key string")
        execs = spark.createDataFrame(
            [(f"ex-{i}", "task-0", i,
              "weird" if i == 5 else
              ["completed", "failed", "running", "pending",
               "cancelled"][i % 5],
              1700000000000 + i * 1000 if i % 6 else None,
              1700000000000 + i * 1000 + i * 77 if i % 7 else None,
              f"job-{i % 3}" if i % 4 else None, i) for i in range(9)],
            "execution_uuid string, scheduled_task_uuid string, "
            "execution_number long, status string, s_ms long, c_ms long, "
            "job_uuid string, created_seq long"
        ).select(
            "execution_uuid", "scheduled_task_uuid", "execution_number",
            "status",
            F.timestamp_millis(F.col("s_ms")).alias("started_at"),
            F.timestamp_millis(F.col("c_ms")).alias("completed_at"),
            "job_uuid", "created_seq")
        jobs = spark.createDataFrame(
            [("job-0", 10, 20, 15, 2, "completed")],
            "job_uuid string, credits_used long, total long, "
            "completed long, failed long, status string")
        return tasks, execs, jobs

    def _run(self, spark, frames, rows):
        req = spark.createDataFrame(
            rows, "req_id string, task_id string, limit_raw string, "
            "offset_raw string, owner_user string, owner_key string")
        out = task_executions_page(*frames, req)
        by_req = {}
        for r in out.collect():
            by_req.setdefault(r["req_id"], []).append(r.asDict())
        for rows_ in by_req.values():
            rows_.sort(key=lambda x: (x["position"] is None,
                                      x["position"]))
        return by_req

    def test_owner_precedence(self, spark, frames):
        got = self._run(spark, frames, [
            ("user_ok", "task-0", None, None, "u1", "k9"),
            ("user_bad_key_ok", "task-0", None, None, "u9", "k1"),
            ("empty_user_falls_to_key", "task-0", None, None, "", "k1"),
            ("no_owner", "task-0", None, None, None, None),
            ("null_user_id_never_matches", "task-1", None, None,
             "u1", None),
        ])
        assert len(got["user_ok"]) == 9
        # a provided userId is checked FIRST even when the key matches
        assert got["user_bad_key_ok"][0]["http_status"] == 404
        assert len(got["empty_user_falls_to_key"]) == 9
        assert len(got["no_owner"]) == 9
        assert got["null_user_id_never_matches"][0]["http_status"] == 404

    def test_desc_order_and_icons(self, spark, frames):
        rows = self._run(spark, frames,
                         [("q", "task-0", None, None, None, None)])["q"]
        assert [r["execution_uuid"] for r in rows] == [
            f"ex-{i}" for i in range(8, -1, -1)]
        by_ex = {r["execution_uuid"]: r for r in rows}
        assert by_ex["ex-0"]["icon"] == "CircleCheck"
        assert by_ex["ex-1"]["icon"] == "CircleX"
        assert by_ex["ex-2"]["icon"] == "Loader"
        assert by_ex["ex-4"]["icon"] == "Ban"
        assert by_ex["ex-5"]["icon"] == "Clock"   # unknown -> fallback

    def test_duration_needs_both_timestamps(self, spark, frames):
        rows = self._run(spark, frames,
                         [("q", "task-0", None, None, None, None)])["q"]
        by_ex = {r["execution_uuid"]: r for r in rows}
        assert by_ex["ex-8"]["duration_ms"] == 8 * 77
        assert by_ex["ex-0"]["duration_ms"] is None   # no started_at
        assert by_ex["ex-7"]["duration_ms"] is None   # no completed_at

    def test_pagination_legs(self, spark, frames):
        got = self._run(spark, frames, [
            ("window", "task-0", "3", "2", None, None),
            ("zero_limit_is_default", "task-0", "0", None, None, None),
            ("past_end_empty_200", "task-0", None, "50", None, None),
            ("empty_history_200", "task-1", None, None, None, None),
        ])
        assert [r["execution_uuid"] for r in got["window"]] == \
            ["ex-6", "ex-5", "ex-4"]
        assert [r["position"] for r in got["window"]] == [1, 2, 3]
        assert len(got["zero_limit_is_default"]) == 9
        for key in ("past_end_empty_200", "empty_history_200"):
            (row,) = got[key]
            assert row["http_status"] == 200
            assert row["execution_uuid"] is None and row["icon"] is None

    def test_job_decoration_left_join(self, spark, frames):
        rows = self._run(spark, frames,
                         [("q", "task-0", None, None, None, None)])["q"]
        by_ex = {r["execution_uuid"]: r for r in rows}
        assert by_ex["ex-3"]["credits_used"] == 10            # job-0
        assert by_ex["ex-3"]["job_status"] == "completed"
        assert by_ex["ex-1"]["credits_used"] is None          # job-1 absent
        assert by_ex["ex-4"]["credits_used"] is None          # no job_uuid


class TestCancelGate:
    def test_transition_table(self, spark):
        jobs = spark.createDataFrame(
            [(_uuid(0), "pending", "https://a.test"),
             (_uuid(1), "scraping", "https://b.test"),
             (_uuid(2), "completed", "https://c.test"),
             (_uuid(3), "failed", "https://d.test"),
             (_uuid(4), "cancelled", "https://e.test")],
            "job_id string, status string, url string")
        req = spark.createDataFrame(
            [(f"r{i}", _uuid(i)) for i in range(5)]
            + [("bad", "zzz"), ("gone", _uuid(9))],
            "req_id string, job_id_raw string")
        got = {r["req_id"]: r.asDict()
               for r in job_cancel_gate(jobs, req).collect()}
        assert got["r0"]["http_status"] == 200
        assert got["r1"]["http_status"] == 200
        assert got["r1"]["webhook_event"] == "crawl.cancelled"
        assert got["r1"]["webhook_url"] == "https://b.test"
        for r in ("r2", "r3", "r4"):
            assert got[r]["http_status"] == 409
            assert got[r]["error"] == "Job already finished"
            assert got[r]["webhook_event"] is None
        # cancel's missing-job branch is 404, unlike results' 400
        assert got["bad"]["http_status"] == 400
        assert got["gone"]["http_status"] == 404
