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
