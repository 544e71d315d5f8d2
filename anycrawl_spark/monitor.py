"""Monitor / diff operators (SURVEY.md §2.8 M1-M5).

Re-expresses ``packages/scrape/src/monitor/normalize.ts:14-86`` and
``monitor/diff.ts:24-261``: content normalization + hashing are JVM column
expressions; the line-level LCS diff is a pure function applied per snapshot
pair via a vectorized UDF over a ``lag()`` window join.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, StringType, StructField,
    StructType,
)

VOLATILE_KEYS = ("timestamp", "screenshot", "screenshot@fullPage")


def normalize_content_col(markdown="markdown", text="text",
                          html="html", raw_html="raw_html"):
    """M1 (normalize.ts:14-78): pick markdown→text→html→rawHtml, collapse
    ≥3 newlines, trim — as a JVM column expression."""
    picked = F.coalesce(*[
        F.when(F.col(c).isNotNull() & (F.col(c) != ""), F.col(c))
        for c in (markdown, text, html, raw_html)
    ], F.lit(""))
    return F.trim(F.regexp_replace(picked, r"\n{3,}", "\n\n"))


def content_hash_col(content_col):
    """M2: sha256 of normalized content (normalize.ts:84-86)."""
    return F.sha2(content_col, 256)


def lcs_diff(old: str, new: str) -> dict:
    """M3 (diff.ts:24-152): line-level LCS diff → added/removed counts,
    unified-style hunks, change ratio."""
    old_lines = old.split("\n") if old else []
    new_lines = new.split("\n") if new else []
    n, m = len(old_lines), len(new_lines)
    # LCS table (small inputs: monitor snapshots are normalized text)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        row, nxt = dp[i], dp[i + 1]
        for j in range(m - 1, -1, -1):
            if old_lines[i] == new_lines[j]:
                row[j] = nxt[j + 1] + 1
            else:
                row[j] = max(nxt[j], row[j + 1])
    # walk
    i = j = 0
    hunks: list[str] = []
    added = removed = 0
    while i < n and j < m:
        if old_lines[i] == new_lines[j]:
            i += 1
            j += 1
        elif dp[i + 1][j] >= dp[i][j + 1]:
            hunks.append(f"-{old_lines[i]}")
            removed += 1
            i += 1
        else:
            hunks.append(f"+{new_lines[j]}")
            added += 1
            j += 1
    for line in old_lines[i:]:
        hunks.append(f"-{line}")
        removed += 1
    for line in new_lines[j:]:
        hunks.append(f"+{line}")
        added += 1
    total = max(n, m, 1)
    return {
        "added": added,
        "removed": removed,
        "change_ratio": round((added + removed) / (total * 2), 6),
        "hunks": hunks[:200],
    }


_DIFF_STRUCT = StructType([
    StructField("added", IntegerType()),
    StructField("removed", IntegerType()),
    StructField("change_ratio", DoubleType()),
    StructField("hunks", ArrayType(StringType())),
])


@F.pandas_udf(_DIFF_STRUCT)
def lcs_diff_udf(old: pd.Series, new: pd.Series) -> pd.DataFrame:
    out = {"added": [], "removed": [], "change_ratio": [], "hunks": []}
    for o, n in zip(old, new):
        d = lcs_diff(o or "", n or "")
        out["added"].append(d["added"])
        out["removed"].append(d["removed"])
        out["change_ratio"].append(d["change_ratio"])
        out["hunks"].append(d["hunks"])
    return pd.DataFrame(out)


def snapshot_changes(snapshots: DataFrame,
                     key_cols: tuple[str, ...] = ("monitor_id", "url"),
                     content_col: str = "content",
                     order_col: str = "captured_at") -> DataFrame:
    """Join each snapshot with its predecessor via lag() and diff the pair
    (SURVEY.md §2.8 M3 mapping). Rows with no change are dropped."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    with_prev = snapshots.withColumn("prev_content", F.lag(content_col).over(w))
    # null-safe direct inequality: sha2(NULL) is NULL, so a hash compare
    # silently dropped transitions to NULL content (and paid two sha256
    # evaluations for a plain equality test)
    changed = with_prev.where(
        F.col("prev_content").isNotNull()
        & ~F.col(content_col).eqNullSafe(F.col("prev_content"))
    )
    return (
        changed.withColumn("diff", lcs_diff_udf(F.col("prev_content"), F.col(content_col)))
        .select(*key_cols, order_col,
                F.col("diff.added").alias("lines_added"),
                F.col("diff.removed").alias("lines_removed"),
                F.col("diff.change_ratio").alias("change_ratio"),
                F.col("diff.hunks").alias("hunks"))
    )


_PRICE_PATH_RE = re.compile(r"price|amount|cost|total", re.I)


def classify_price_change(path: str, old_value: float | None,
                          new_value: float | None,
                          pct_threshold: float = 5.0) -> str:
    """M5 (diff.ts:230-261): price-change classifier — regex on the JSON
    path + percentage threshold."""
    if not _PRICE_PATH_RE.search(path or ""):
        return "not_price"
    if old_value is None or new_value is None or old_value == 0:
        return "price_unknown"
    pct = abs(new_value - old_value) / abs(old_value) * 100.0
    if pct >= pct_threshold:
        return "price_drop" if new_value < old_value else "price_increase"
    return "price_minor"


def json_field_diff(old: dict | list | None, new: dict | list | None,
                    path: str = "") -> list[dict]:
    """M4 (diff.ts:170-209): recursive JSON field diff → flat change records
    {path, change ∈ added/removed/modified, old_value, new_value} with
    numeric delta where both sides are numbers."""
    changes: list[dict] = []

    def rec(o, n, p):
        if isinstance(o, dict) and isinstance(n, dict):
            for k in sorted(set(o) | set(n)):
                child = f"{p}.{k}" if p else k
                if k not in o:
                    changes.append({"path": child, "change": "added",
                                    "old_value": None, "new_value": n[k], "delta": None})
                elif k not in n:
                    changes.append({"path": child, "change": "removed",
                                    "old_value": o[k], "new_value": None, "delta": None})
                else:
                    rec(o[k], n[k], child)
        elif isinstance(o, list) and isinstance(n, list):
            for i in range(max(len(o), len(n))):
                child = f"{p}[{i}]"
                if i >= len(o):
                    changes.append({"path": child, "change": "added",
                                    "old_value": None, "new_value": n[i], "delta": None})
                elif i >= len(n):
                    changes.append({"path": child, "change": "removed",
                                    "old_value": o[i], "new_value": None, "delta": None})
                else:
                    rec(o[i], n[i], child)
        elif o != n:
            delta = None
            if isinstance(o, (int, float)) and isinstance(n, (int, float)) \
                    and not isinstance(o, bool) and not isinstance(n, bool):
                delta = n - o
            changes.append({"path": p, "change": "modified",
                            "old_value": o, "new_value": n, "delta": delta})

    # only None coerces to {} — falsy roots (0, '', [], False) are real values
    rec(old if old is not None else {}, new if new is not None else {}, path)
    return changes


# --- M6 (r5): LLM change judge — monitor/judge.ts:1-59 -------------------

JUDGE_SYSTEM_PROMPT = """You are a change-detection judge. Your only job is to decide whether an observed diff on a web page is meaningful relative to the stated monitoring goal.

Ignore mechanical noise such as rotating tokens, session IDs, footer timestamps, ad slots, or cache-buster query strings.

Respond ONLY with a JSON object matching the schema: { meaningful: boolean, confidence: "low"|"medium"|"high", reason: string }."""

JUDGE_FALLBACK = {"meaningful": True, "confidence": "low",
                  "reason": "AI judge unavailable; defaulting to meaningful"}


def build_judge_prompt(goal: str, diff_text: str, url: str) -> str:
    """judge.ts:38-45 — byte-exact user prompt; the diff is truncated to its
    first 3000 chars."""
    return (f'Monitoring goal: "{goal}"\n\nURL: {url}\n\n'
            f"Diff (unified format, first 3000 chars):\n{diff_text[:3000]}\n\n"
            f"Is this change meaningful relative to the goal?")


def judge_change(goal: str, diff_text: str, url: str,
                 model_call=None) -> dict:
    """judge.ts judgeChange: ask a model whether a diff is meaningful
    relative to the monitoring goal. ``model_call(system, prompt) -> dict``
    is the provider seam (reference: generateObject against the verdict zod
    schema). Any failure — no provider configured, call error, or an
    out-of-schema verdict — degrades to the reference's fallback verdict so
    monitoring keeps running without AI (judge.ts:53-57; note the code's
    catch path returns confidence "low", which supersedes the stale
    doc-comment's "medium")."""
    if model_call is None:
        return dict(JUDGE_FALLBACK)
    try:
        verdict = model_call(JUDGE_SYSTEM_PROMPT,
                             build_judge_prompt(goal, diff_text, url))
        if (isinstance(verdict, dict)
                and isinstance(verdict.get("meaningful"), bool)
                and verdict.get("confidence") in ("low", "medium", "high")
                and isinstance(verdict.get("reason"), str)):
            return {"meaningful": verdict["meaningful"],
                    "confidence": verdict["confidence"],
                    "reason": verdict["reason"]}
        return dict(JUDGE_FALLBACK)
    except Exception:
        return dict(JUDGE_FALLBACK)


JUDGE_STRUCT = StructType([
    StructField("meaningful", BooleanType()),
    StructField("confidence", StringType()),
    StructField("reason", StringType()),
])


def make_judge_udf(goal: str, model_call=None):
    """Batch change-judging over (diff_text, url) columns — the Spark seam
    for running judge_change across a monitor job's changed snapshots."""

    @F.pandas_udf(JUDGE_STRUCT)
    def judge(diff_text: pd.Series, url: pd.Series) -> pd.DataFrame:
        out = {"meaningful": [], "confidence": [], "reason": []}
        for d, u in zip(diff_text, url):
            v = judge_change(goal, d or "", u or "", model_call=model_call)
            out["meaningful"].append(v["meaningful"])
            out["confidence"].append(v["confidence"])
            out["reason"].append(v["reason"])
        return pd.DataFrame(out)

    return judge
