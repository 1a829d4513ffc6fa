"""Sessionization as a reusable batch composition (SURVEY.md §2.8).

Classic gap-based sessionization: flag a session start whenever the gap
to the previous event exceeds the timeout, then a running sum of flags
numbers the sessions.  Two window passes over ONE shuffle on the
session key — scales linearly; the Structured Streaming twin is
``session_window`` (see streaming/mirrors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts_us: str = "ts_us",
    order_tiebreak: str = "event_id",
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Assign 1-based session ids per key from epoch-microsecond times."""
    w = Window.partitionBy(key).orderBy(ts_us, order_tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_us = F.lag(ts_us).over(w)
    new_sess = F.when(
        lag_us.isNull() | ((F.col(ts_us) - lag_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("sess_id", F.sum(new_sess).over(run).cast("long"))
