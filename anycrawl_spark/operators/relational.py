"""Relational operators Spark lacks natively, built scale-first.

As-of join (backward): for each left row, the single right row with the
greatest timestamp ≤ the left timestamp within the same key. The naive
formulation — a range join + per-left-row max — explodes to O(|L|·|R|) pairs
per key under Spark's BroadcastNestedLoopJoin. This implementation uses the
union trick instead: tag both sides, union them, and run ONE keyed window
(partitionBy key, orderBy (ts, tag)) carrying the most recent right row
forward via ``last_value(..., ignorenulls=True)``. Cost = one shuffle by
key + a sort — the same plan shape as any keyed aggregation, no pair
explosion, no skew beyond the key's own row count (salt hot keys upstream
if needed).

Tie semantics: right rows sort BEFORE left rows at an equal timestamp
(tag 0 < 1), so a right row with ts == left ts matches — the standard
``l.ts >= r.ts`` as-of contract (DuckDB ASOF JOIN equivalent, which the
oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       right_cols: list[str] | None = None,
                       suffix: str = "_right") -> DataFrame:
    """Left as-of-backward join: every ``left`` row + the latest ``right``
    row (per ``on`` key) with ``right_ts <= left_ts``; right columns come
    back suffixed, NULL when no prior right row exists."""
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    lhs = left.withColumn("__tag", F.lit(1)).withColumn(
        "__t", F.col(left_ts))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    for c in left.columns:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c])) \
            if c not in rhs.columns else rhs
    lhs_aligned = lhs
    for c in carried:
        lhs_aligned = lhs_aligned.withColumn(
            c, F.lit(None).cast(dict(rhs.dtypes)[c]))
    unioned = lhs_aligned.unionByName(rhs, allowMissingColumns=False)
    w = (Window.partitionBy(on).orderBy("__t", "__tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.where(F.col("__tag") == 1).drop("__tag", "__t")


def interval_join_bucketed(points: DataFrame, intervals: DataFrame,
                           point_ts: str = "ts",
                           start_col: str = "start_ts",
                           end_col: str = "end_ts",
                           bucket_seconds: int = 3600) -> DataFrame:
    """Range/interval join (point ∈ [start, end)) without a nested-loop
    plan: both sides key on coarse time buckets — intervals EXPLODE into
    every bucket they overlap (sequence + explode), points map to one
    bucket — then an equi-join on the bucket plus an exact containment
    filter. Cost = interval replication factor (interval length /
    bucket_seconds), a shuffle hash join, and no O(|P|·|I|) comparison;
    this is the standard scale pattern Spark's optimizer cannot derive from
    a raw BETWEEN predicate (which plans BroadcastNestedLoopJoin)."""
    p_bucket = F.floor(F.col(point_ts).cast("timestamp").cast("long")
                       / bucket_seconds)
    i_start = F.col(start_col).cast("timestamp").cast("long")
    i_end = F.col(end_col).cast("timestamp").cast("long")
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(i_start / bucket_seconds),
                             F.floor((i_end - 1) / bucket_seconds))))
    tagged = points.withColumn("__bucket", p_bucket)
    joined = tagged.join(exploded, "__bucket")  # inner: containment filter
    # below would drop left-join NULL rows anyway
    contained = (
        (F.col(point_ts).cast("timestamp") >= F.col(start_col).cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") < F.col(end_col).cast("timestamp"))
    )
    return joined.where(contained).drop("__bucket")
