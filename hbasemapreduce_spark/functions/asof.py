"""As-of join as a reusable DataFrame composition (SURVEY.md §2.3/§4).

Spark SQL has no native ASOF JOIN; the classic scalable pattern is
union-tag + running ``last(ignorenulls)`` window:

1. tag left rows (probe) and right rows (reference) and union them on
   aligned (key, time, payload) columns;
2. sort within each key by (time, side, tiebreak) — right rows sort
   *before* left rows at equal time, giving at-or-before semantics;
3. ``last(payload, ignorenulls)`` over rows UNBOUNDED PRECEDING..CURRENT
   carries the latest reference payload forward;
4. keep the left rows.

Cost model at scale: ONE shuffle on the join key (same as any
sort-merge join) and a single-pass window — no nested-loop, no range
explosion.  Skewed keys can be salted upstream by splitting hot keys
into sub-ranges of time; not needed for the benchmark data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: Column,
    right_key: Column,
    left_time: Column,
    right_time: Column,
    payload: dict[str, Column],
    right_tiebreak: list[Column] | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_time <= left_time`` and matching key.

    ``payload`` maps output column name -> right-side Column.  Ties on
    ``right_time`` are broken by ``right_tiebreak`` (ascending; the
    LAST row wins, i.e. the max tiebreak) — pass a total ordering for
    deterministic output.
    """
    right_tiebreak = right_tiebreak or []
    pay_names = list(payload)

    # The carried payload is ONE STRUCT, not independent columns:
    # last(col, ignorenulls) per column would (a) skip a right row whose
    # payload value is legitimately NULL, resurrecting an older value,
    # and (b) mix fields from DIFFERENT right rows when some are null.
    # The struct is non-null exactly when a right row exists, so null
    # fields ride through and all fields come from the same matched row.
    pay_struct = F.struct(*[c.alias(n) for n, c in payload.items()])
    pay_type = right.select(pay_struct.alias("_pay")).schema["_pay"].dataType

    l_tagged = left.select(
        left_key.cast("long").alias("_k"),
        left_time.cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
        *[F.lit(None).cast(right.select(c).schema[0].dataType).alias(f"_tb_{i}") for i, c in enumerate(right_tiebreak)],
        F.struct(*left.columns).alias("_left"),
    )
    r_tagged = right.select(
        right_key.cast("long").alias("_k"),
        right_time.cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        pay_struct.alias("_pay"),
        *[c.alias(f"_tb_{i}") for i, c in enumerate(right_tiebreak)],
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
    )

    order = [F.col("_t").asc(), F.col("_side").asc()] + [
        F.col(f"_tb_{i}").asc_nulls_first() for i in range(len(right_tiebreak))
    ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_pay", ignorenulls=True).over(w).alias("_m")
    )
    out = merged.filter(F.col("_side") == 1).select(
        F.col("_left.*"), *[F.col(f"_m.{n}").alias(n) for n in pay_names]
    )
    return out


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: Column,
    right_key: Column,
    left_time: Column,
    right_time: Column,
    payload: dict[str, Column],
    right_tiebreak: Column | None = None,
    dist_col: str = "_nearest_dist",
) -> DataFrame:
    """For each left row, attach the payload of the NEAREST right row in
    time — either direction — plus its absolute distance as ``dist_col``
    (the pandas ``merge_asof(direction='nearest')`` semantics).

    Times must be NUMERIC (e.g. ``unix_micros``) — distance is plain
    bigint subtraction, never float.  Tie rules are total: equal
    distance prefers the backward (earlier) match; equal right
    timestamps break by ``right_tiebreak`` (max wins backward — the
    asof "latest wins" convention — min wins forward).

    Scale shape: the same union-tag machinery as :func:`asof_join`, but
    BOTH directions are read off ONE (key, time, side, tiebreak) sort —
    a backward ``last(ignorenulls)`` frame and a forward
    ``first(ignorenulls)`` frame over the same window ordering.  Spark
    plans a single Exchange+Sort feeding one Window node: one shuffle,
    linear state, no inequality join, no candidate explosion."""
    pay_names = list(payload)
    # The carried struct always includes the right time (for the
    # distance) — same one-struct rationale as asof_join.
    pay = F.struct(
        right_time.cast("long").alias("_rt"),
        *[c.alias(n) for n, c in payload.items()],
    )
    pay_type = right.select(pay.alias("_pay")).schema["_pay"].dataType
    tb_type = (
        right.select(right_tiebreak.alias("_tb")).schema["_tb"].dataType
        if right_tiebreak is not None
        else "long"
    )
    l_tagged = left.select(
        left_key.cast("long").alias("_k"),
        left_time.cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*left.columns).alias("_left"),
    )
    r_tagged = right.select(
        right_key.cast("long").alias("_k"),
        right_time.cast("long").alias("_t"),
        F.lit(0).alias("_side"),
        pay.alias("_pay"),
        (right_tiebreak if right_tiebreak is not None else F.lit(0)).alias("_tb"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
    )
    # Right rows sort BEFORE left rows at equal time (side 0 < 1): a
    # right row at exactly the left time lands in the backward frame
    # (dist 0) and the forward frame is strictly-after.
    order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first()]
    wb = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "*",
        F.last("_pay", ignorenulls=True).over(wb).alias("_bk"),
        F.first("_pay", ignorenulls=True).over(wf).alias("_fw"),
    )
    bd = F.col("_t") - F.col("_bk._rt")
    fd = F.col("_fw._rt") - F.col("_t")
    take_back = F.col("_bk").isNotNull() & (F.col("_fw").isNull() | (bd <= fd))
    chosen = F.when(take_back, F.col("_bk")).otherwise(F.col("_fw"))
    dist = F.when(take_back, bd).otherwise(fd)
    return merged.filter(F.col("_side") == 1).select(
        F.col("_left.*"),
        *[chosen[n].alias(n) for n in pay_names],
        dist.alias(dist_col),
    )
