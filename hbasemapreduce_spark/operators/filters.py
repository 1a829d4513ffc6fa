"""§2.2 Projections / filters / predicates.

Reference grounding (SURVEY.md §2.2 `[public-api]`): HBase Scan
filters — SingleColumnValueFilter, FilterList(MUST_PASS_ALL/ONE),
RegexStringComparator, PageFilter.  All collapse to declarative Column
predicates; Catalyst pushes the simple ones into the parquet scan and
the regex runs inside whole-stage codegen (JVM, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .common import LINEITEM_SQL, ORDERS_SQL, lineitem_select, orders_select

# \z (end of TEXT) instead of $: Java regex (Spark rlike) lets $ match
# before a trailing newline while RE2 (DuckDB regexp_matches) does not —
# \z means end-of-input in BOTH engines, so the oracle can never diverge
# on newline-terminated text.
_REGEX = r"(^| )spark( |\z)"


@query(
    "filter_value",
    category="filter",
    oracle=f"SELECT {LINEITEM_SQL} FROM lineitem WHERE l_quantity > 45",
)
def filter_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SingleColumnValueFilter(GREATER) equivalent."""
    df = load_table(spark, sf_dir, "lineitem")
    return df.filter(F.col("l_quantity") > 45).select(*lineitem_select(df))


@query(
    "filter_compound",
    category="filter",
    oracle=(
        f"SELECT {ORDERS_SQL} FROM orders "
        "WHERE (o_orderstatus = 'O' AND o_totalprice > 150000) "
        "OR (o_orderpriority = '1-URGENT' AND o_totalprice <= 50000)"
    ),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterList AND/OR composition as boolean Column algebra."""
    df = load_table(spark, sf_dir, "orders")
    pred = ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000)) | (
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") <= 50000)
    )
    return df.filter(pred).select(*orders_select(df))


@query(
    "filter_regex",
    category="filter",
    oracle=f"SELECT * FROM documents WHERE regexp_matches(text, '{_REGEX}')",
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegexStringComparator equivalent (pattern valid in Java regex + RE2)."""
    return load_table(spark, sf_dir, "documents").filter(F.col("text").rlike(_REGEX))


@query(
    "filter_in",
    category="filter",
    oracle=(
        f"SELECT {ORDERS_SQL} FROM orders "
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ),
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "orders")
    return df.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        *orders_select(df)
    )


@query(
    "filter_null",
    category="filter",
    oracle=(
        "SELECT props IS NULL AS props_null, COUNT(*) AS cnt FROM events GROUP BY 1"
    ),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase has no NULL, only absent cells; here: IS NULL partition counts."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("props").isNull().alias("props_null"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "page_limit",
    category="filter",
    oracle=f"SELECT {ORDERS_SQL} FROM orders ORDER BY o_orderkey LIMIT 50",
)
def page_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageFilter(50) after a key-ordered scan: TakeOrderedAndProject —
    per-partition top-k then merge, no global sort at scale."""
    df = load_table(spark, sf_dir, "orders")
    return df.orderBy("o_orderkey").limit(50).select(*orders_select(df))
