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
                       suffix: str = "_right",
                       right_tiebreak: str | None = None) -> DataFrame:
    """Left as-of-backward join: every ``left`` row + the latest ``right``
    row (per ``on`` key) with ``right_ts <= left_ts``; right columns come
    back suffixed, NULL when no prior right row exists.

    The right row's columns travel as ONE struct so the carry-forward is
    atomic: ``last(col, ignorenulls=True)`` per column would skip a genuine
    NULL in the latest right row and resurrect an older non-null value,
    mixing columns from two different right rows. ``right_tiebreak`` makes
    the winner among right rows sharing (key, ts) deterministic (highest
    value wins); without it ties resolve by partition-internal order."""
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c).alias(c) for c in right_cols],
                 F.col(right_ts).alias("__rts")).alias("__rpay"),
        (F.col(right_tiebreak) if right_tiebreak
         else F.lit(0)).alias("__tb"),
    )
    pay_type = rhs.schema["__rpay"].dataType
    tb_type = dict(rhs.dtypes)["__tb"]
    lhs = (
        left.withColumn("__tag", F.lit(1))
        .withColumn("__t", F.col(left_ts))
        .withColumn("__rpay", F.lit(None).cast(pay_type))
        .withColumn("__tb", F.lit(None).cast(tb_type))
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = lhs.unionByName(rhs, allowMissingColumns=False)
    w = (Window.partitionBy(on).orderBy("__t", "__tag", "__tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned.withColumn("__rpay", F.last("__rpay", ignorenulls=True).over(w))
    out = out.where(F.col("__tag") == 1)
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__rpay")[c])
    out = out.withColumn(f"{right_ts}{suffix}", F.col("__rpay")["__rts"])
    return out.drop("__tag", "__t", "__tb", "__rpay")


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
    # fractional seconds matter only for the LAST covered bucket: a
    # half-open end of e.g. 3600.5s still covers bucket 1, but
    # floor((3600-1)/3600) from the truncated long would stop at bucket 0.
    # unix_micros keeps the fraction; the -1 micro implements half-open.
    i_start = F.unix_micros(F.col(start_col).cast("timestamp"))
    i_end = F.unix_micros(F.col(end_col).cast("timestamp"))
    bucket_us = bucket_seconds * 1_000_000
    first_b = F.floor(i_start / bucket_us)
    last_b = F.floor((i_end - 1) / bucket_us)  # >= first_b given end > start
    exploded = (
        intervals
        .where(i_end > i_start)  # degenerate/reversed intervals match nothing
        .withColumn("__bucket", F.explode(F.sequence(first_b, last_b)))
    )
    tagged = points.withColumn("__bucket", p_bucket)
    joined = tagged.join(exploded, "__bucket")  # inner: containment filter
    # below would drop left-join NULL rows anyway
    contained = (
        (F.col(point_ts).cast("timestamp") >= F.col(start_col).cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") < F.col(end_col).cast("timestamp"))
    )
    return joined.where(contained).drop("__bucket")
