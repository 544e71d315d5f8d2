"""Billing ledger fold (Billing.ts:176-445) and execution-finalize pure
semantics — the distributed paths are oracled via
operators/queries.py::{ledger_rollup, execution_finalize,
execution_task_stats}; these cover the sequential edge cases the
arithmetic fixtures can't synthesize (default delta keys, mid-stream
targets, itemization fallbacks)."""

import math

import pandas as pd

from anycrawl_spark.billing import (
    _fold_job_charges,
    build_default_idempotency_key,
    normalize_charge_details,
    normalize_idempotency_key,
    normalize_non_negative_number,
    normalize_positive_number,
)


class TestNormalizers:
    def test_positive(self):
        assert normalize_positive_number(2.5) == 2.5
        assert normalize_positive_number(0) == 0
        assert normalize_positive_number(-3) == 0
        assert normalize_positive_number(math.nan) == 0
        assert normalize_positive_number(math.inf) == 0
        assert normalize_positive_number(None) == 0      # Number(null) = 0
        assert normalize_positive_number("2") == 2.0     # Number coercion
        assert normalize_positive_number("x") == 0

    def test_non_negative(self):
        assert normalize_non_negative_number(0) == 0
        assert normalize_non_negative_number(-1) == 0
        assert normalize_non_negative_number(7.5) == 7.5

    def test_idempotency_key(self):
        assert normalize_idempotency_key("  k1  ") == "k1"
        assert normalize_idempotency_key("   ") is None
        assert normalize_idempotency_key(None) is None
        assert normalize_idempotency_key(5) is None

    def test_default_keys(self):
        assert build_default_idempotency_key(
            "delta", "j1", "pages", 3, 5.5) == "billing:delta:j1:3->5.5:pages"
        assert build_default_idempotency_key(
            "target", "j1", "sync", 3, 10) == "billing:target:j1:10:sync"


class TestChargeDetails:
    def test_matching_items_pass_through(self):
        d = normalize_charge_details(
            {"calculator": " c1 ", "items": [
                {"code": " page ", "credits": 2, "meta": {"n": 1}},
                {"code": "proxy", "credits": 1.5}]},
            3.5, "r")
        assert d["calculator"] == "c1"
        assert d["total"] == 3.5
        assert [i["code"] for i in d["items"]] == ["page", "proxy"]
        assert d["items"][0]["meta"] == {"n": 1}

    def test_invalid_items_dropped_then_mismatch_falls_back(self):
        d = normalize_charge_details(
            {"items": [{"code": "", "credits": 2},
                       {"code": "x", "credits": 0},
                       {"code": "y", "credits": "bad"},
                       None, "junk"]},
            2, "reason-1")
        assert d["calculator"] == "billing_v1"
        assert d["items"] == [{
            "code": "unattributed_adjustment", "credits": 2.0,
            "meta": {"reason": "reason-1", "source_total": 0}}]

    def test_none_when_nothing_charged_or_no_items(self):
        assert normalize_charge_details({"items": [{"code": "a",
                                                    "credits": 1}]},
                                        0, "r") is None
        assert normalize_charge_details(None, 5, "r") is None
        assert normalize_charge_details({"items": "not-a-list"}, 5,
                                        "r") is None

    def test_float_tolerance(self):
        d = normalize_charge_details(
            {"items": [{"code": "a", "credits": 0.1},
                       {"code": "b", "credits": 0.2}]},
            0.30000000000000004, "r")
        assert d["items"][0]["code"] == "a"   # < 1e-9 tolerance matches


def _fold(events, init_used=0.0):
    cols = ["seq", "job_id", "api_key", "init_used", "mode", "amount",
            "reason", "idempotency_key", "calculator", "items"]
    rows = []
    for i, ev in enumerate(events):
        rows.append({
            "seq": ev.get("seq", i), "job_id": "j1", "api_key": "k1",
            "init_used": init_used, "mode": ev.get("mode", "delta"),
            "amount": ev["amount"], "reason": ev.get("reason", "unknown"),
            "idempotency_key": ev.get("key"),
            "calculator": ev.get("calculator"),
            "items": ev.get("items"),
        })
    return _fold_job_charges(pd.DataFrame(rows, columns=cols))


class TestLedgerFold:
    def test_delta_sequence_advances_used(self):
        out = _fold([{"amount": 2}, {"amount": 3.5}], init_used=1)
        assert list(out["before_used"]) == [1, 3]
        assert list(out["after_used"]) == [3, 6.5]
        assert list(out["charged"]) == [2, 3.5]

    def test_nonpositive_delta_books_nothing_and_keeps_key_unconsumed(self):
        out = _fold([{"amount": 0, "key": "k"},
                     {"amount": -2, "key": "k"},
                     {"amount": 4, "key": "k"}])
        assert len(out) == 1
        assert out["charged"].iloc[0] == 4   # key not burned by no-ops

    def test_explicit_key_dedup_no_state_change(self):
        out = _fold([{"amount": 2, "key": "a"},
                     {"amount": 9, "key": "a"},     # deduped
                     {"amount": 1, "key": "b"}])
        assert list(out["charged"]) == [2, 1]
        assert list(out["after_used"]) == [2, 3]

    def test_default_delta_keys_differ_as_used_advances(self):
        out = _fold([{"amount": 5, "reason": "x"},
                     {"amount": 5, "reason": "x"}])
        assert list(out["idempotency_key"]) == [
            "billing:delta:j1:0->5:x", "billing:delta:j1:5->10:x"]
        assert len(out) == 2

    def test_target_mid_stream_resets_watermark(self):
        out = _fold([{"amount": 2},
                     {"mode": "target", "amount": 10, "reason": "sync"},
                     {"amount": 1},
                     {"mode": "target", "amount": 10}])   # already reached
        assert list(out["mode"]) == ["delta", "target", "delta"]
        assert list(out["charged"]) == [2, 8, 1]
        assert list(out["after_used"]) == [2, 10, 11]
        assert out["idempotency_key"].iloc[1] == "billing:target:j1:10:sync"

    def test_target_below_used_is_noop(self):
        out = _fold([{"amount": 5}, {"mode": "target", "amount": 3}])
        assert len(out) == 1

    def test_details_columns(self):
        out = _fold([{"amount": 3, "items": [{"code": "page",
                                              "credits": 3.0}]},
                     {"amount": 2, "items": [{"code": "page",
                                              "credits": 9.0}]},
                     {"amount": 1}])
        assert list(out["detail_code"]) == ["page", "unattributed_adjustment",
                                            None]
        assert list(out["detail_calculator"]) == ["billing_v1", "billing_v1",
                                                  None]
        assert out["detail_total"].iloc[0] == 3.0

    def test_empty_job_emits_schema_only(self):
        out = _fold([{"amount": 0}])
        assert len(out) == 0
        assert "idempotency_key" in out.columns


class TestLedgerFoldGuards:
    def test_null_init_used_treated_as_zero(self):
        # Number(creditsUsed ?? 0): pandas NULL arrives as NaN (truthy!)
        out = _fold([{"amount": 2}], init_used=math.nan)
        assert list(out["before_used"]) == [0.0]
        assert list(out["after_used"]) == [2.0]

    def test_default_keys_use_js_number_rendering(self):
        out = _fold([{"amount": 1e-7, "reason": "x"}])
        assert out["idempotency_key"].iloc[0] == "billing:delta:j1:0->1e-7:x"
