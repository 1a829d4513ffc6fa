"""§2.5 Window functions (north-star rows — no HBase-MR analog beyond
reducer secondary sort; SURVEY.md §2.5).

Determinism: every ORDER BY inside a window carries a total tiebreak;
running/moving sums use the decimal sandwich so segment-tree vs
sequential evaluation differences between engines cannot surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..registry import query


@query(
    "win_rank",
    category="window",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk "
        "FROM orders"
    ),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank orders by price within customer (ties share a rank —
    deterministic without a tiebreak)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.rank().over(w).alias("rnk")
    )


@query(
    "win_topk_per_group",
    category="window",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
        "  SELECT o_custkey, o_orderkey, o_totalprice, "
        "  row_number() OVER (PARTITION BY o_custkey "
        "                     ORDER BY o_totalprice DESC, o_orderkey) AS rn "
        "  FROM orders) WHERE rn <= 3"
    ),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (total tie-broken ordering)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "win_running_sum",
    category="window",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
        "  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev "
        "FROM orders"
    ),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer by order date."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_rev"),
    )


@query(
    "win_lag_delta",
    category="window",
    oracle=(
        "SELECT event_id, user_id, "
        "epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER ("
        "  PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS delta_us "
        "FROM events"
    ),
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap in microseconds (epoch bigint math —
    no raw timestamps in output)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("delta_us"),
    )


@query(
    "win_moving_avg",
    category="window",
    oracle=(
        "WITH daily AS ("
        "  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num, "
        "         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev "
        "  FROM orders GROUP BY 1) "
        "SELECT day_num, CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg "
        "FROM daily "
        "WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)"
    ),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue (RANGE frame over a
    days-since-epoch bigint, so calendar gaps are handled).

    Scale note: the unpartitioned window runs over the *daily* rollup
    (cardinality = distinct days, thousands of rows at any data scale),
    not over raw orders — the heavy lifting is the partial+final hash
    aggregate feeding it.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_num")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day_num",
        (F.sum("rev").over(w).cast("double") / F.count("*").over(w)).alias("mov_avg"),
    )


@query(
    "x_win_cume_dist",
    category="window",
    oracle=(
        "SELECT DISTINCT event_type, value, "
        "cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd "
        "FROM events"
    ),
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF per type via cume_dist(): for each distinct value,
    the fraction of the type's rows at or below it — the
    quantile-lookup companion to x_feature_binning (which inverts this
    map) and x_agg_decile (which samples it at 10 points).  Peer rows
    (ties) share one cume_dist in both engines (ANSI semantics:
    peers count together), so DISTINCT collapses the output to the
    bounded |types| x |distinct values| grid.  cd = running_count/cnt —
    a ratio of exact bigints, one correctly-rounded division.

    Scale shape: one range-partitioned per-type sort; output bounded
    by the distinct-value grid, not row count."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value")
    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", F.cume_dist().over(w).alias("cd"))
        .distinct()
    )
