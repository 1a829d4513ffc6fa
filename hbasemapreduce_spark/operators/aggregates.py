"""§2.4 Aggregations.

Reference grounding (SURVEY.md §2.4 `[public-api]`): RowCounter /
CellCounter stock tools, TableReducer sum jobs, the canonical MR
word-count.  Spark executes all of these as partial+final hash
aggregates (map-side combine is automatic — the Combiner the reference
had to hand-write).  ROLLUP/CUBE/approx-distinct are north-star
additions (BASELINE.json:6).

All float sums use the decimal sandwich (functions/determinism.py) so
results are bit-identical at any partition count — the property that
makes them hash-match DuckDB and makes reruns stable on a 1000-executor
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..functions.determinism import dec_avg, dec_sum
from ..registry import query


@query("agg_rowcount", category="agg", oracle="SELECT COUNT(*) AS n FROM lineitem")
def agg_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RowCounter: total row count as a 1-row DataFrame."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@query(
    "agg_cellcount",
    category="agg",
    oracle=(
        "SELECT "
        + ", ".join(f"COUNT({c}) AS cnt_{c}" for c in _EVENT_COLS)
        + " FROM events"
    ),
)
def agg_cellcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CellCounter: non-null cell count per column."""
    return load_table(spark, sf_dir, "events").agg(
        *[F.count(c).alias(f"cnt_{c}") for c in _EVENT_COLS]
    )


@query(
    "agg_group_sum",
    category="agg",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical TableReducer sum: quantity per return flag."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(dec_sum("l_quantity", "sum_qty"))
    )


@query(
    "agg_multi",
    category="agg",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price, "
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price, "
        "CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-accumulator aggregate with derived exprs."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price", scale=6),
            dec_sum(charge, "sum_charge", scale=6),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    category="agg",
    oracle=(
        "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (two-stage MR job in the genre)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


@query("agg_approx_distinct", category="agg", oracle=None)  # rows-only: HLL++ != DuckDB's sketch
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users (HLL++): constant memory at 100 TB,
    where exact countDistinct would shuffle every key."""
    return load_table(spark, sf_dir, "events").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "agg_rollup",
    category="agg",
    oracle=(
        "SELECT n_name, o_orderstatus, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, "
        "COUNT(*) AS cnt "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY ROLLUP(n_name, o_orderstatus)"
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: (nation, status) -> nation -> grand total."""
    orders, customer, nation = load_tables(spark, sf_dir, "orders", "customer", "nation")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "o_orderstatus")
        .agg(dec_sum("o_totalprice", "revenue"), F.count("*").alias("cnt"))
    )


@query(
    "agg_cube",
    category="agg",
    oracle=(
        "SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS cnt, "
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY CUBE(event_type, user_bucket)"
    ),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All marginal totals over (event_type, user bucket)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count("*").alias("cnt"), dec_sum("value", "sum_value", scale=6)
    )


@query(
    "wordcount",
    category="agg",
    oracle=(
        "SELECT token, COUNT(*) AS cnt FROM "
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
        "GROUP BY token"
    ),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonical MapReduce job, over documents.text."""
    return (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "x_agg_mode",
    category="agg",
    oracle=(
        "WITH cnt AS ("
        "  SELECT l_returnflag, l_shipmode_proxy, COUNT(*) AS c FROM ("
        "    SELECT l_returnflag, l_linestatus || '-' || CAST(l_linenumber % 3 AS VARCHAR) "
        "    AS l_shipmode_proxy FROM lineitem) GROUP BY 1, 2), "
        "rk AS ("
        "  SELECT l_returnflag, l_shipmode_proxy, c, "
        "  row_number() OVER (PARTITION BY l_returnflag "
        "                     ORDER BY c DESC, l_shipmode_proxy) AS rn FROM cnt) "
        "SELECT l_returnflag, l_shipmode_proxy AS mode_value, c AS mode_count "
        "FROM rk WHERE rn = 1"
    ),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group statistical MODE with a deterministic tie-break (count
    desc, then value asc) — the argmax-of-counts pattern.  Two-level
    shape: a partial+final count aggregate (map-side combine shrinks
    the shuffle to distinct (group, value) pairs), then a row_number
    window over the already-tiny count table.  Never a collect, never a
    re-scan; at 100 TB the window input is |groups| x |values|, not
    |rows|."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.concat(
            F.col("l_linestatus"), F.lit("-"), (F.col("l_linenumber") % 3).cast("string")
        ).alias("l_shipmode_proxy"),
    )
    cnt = li.groupBy("l_returnflag", "l_shipmode_proxy").agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("c"), F.asc("l_shipmode_proxy"))
    return (
        cnt.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_shipmode_proxy").alias("mode_value"),
            F.col("c").alias("mode_count"),
        )
    )
