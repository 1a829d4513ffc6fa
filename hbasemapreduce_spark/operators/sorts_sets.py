"""§2.6 Sorts / limits / top-k / set operations.

Reference grounding (SURVEY.md §2.6): MR shuffle sort order /
TotalOrderPartitioner; set ops are hand-written multi-input MR jobs in
the genre.  Spark: range-partitioned sort, TakeOrderedAndProject for
top-k (per-partition heap + merge — O(k) memory per task at any scale),
and native set operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .common import ORDERS_SQL, orders_select


@query(
    "sort_orderby",
    category="sort",
    oracle=f"SELECT {ORDERS_SQL} FROM orders ORDER BY o_orderdate DESC, o_orderkey",
)
def sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort via range partitioning (TotalOrderPartitioner analog)."""
    df = load_table(spark, sf_dir, "orders")
    return df.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey")).select(*orders_select(df))


@query(
    "topk_global",
    category="sort",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity FROM lineitem "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"
    ),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with total tie-broken ordering (hash-stable)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


_UNION_SQL = (
    "SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders "
    "WHERE o_orderpriority = '1-URGENT' "
    "UNION {all}"
    "SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders "
    "WHERE o_totalprice > 100000"
)


def _union_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    return (
        df.filter(F.col("o_orderpriority") == "1-URGENT"),
        df.filter(F.col("o_totalprice") > 100000),
    )


@query("set_union_all", category="set", oracle=_UNION_SQL.format(all="ALL "))
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _union_sides(spark, sf_dir)
    return a.unionByName(b)


@query("set_union_distinct", category="set", oracle=_UNION_SQL.format(all=""))
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _union_sides(spark, sf_dir)
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    category="set",
    oracle=(
        "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
        "INTERSECT "
        "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'"
    ),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys both in BUILDING segment and holding open orders."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    open_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.intersect(open_orders)


@query(
    "set_except",
    category="set",
    oracle=(
        "SELECT o_custkey AS custkey FROM orders "
        "EXCEPT "
        "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"
    ),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys having orders but not in the AUTOMOBILE segment."""
    with_orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    auto = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return with_orders.subtract(auto)  # EXCEPT (distinct) semantics


@query(
    "distinct_rows",
    category="set",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
