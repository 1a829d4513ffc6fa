"""Shared column lists for checked outputs.

Timestamp columns are formatted to 'yyyy-MM-dd' strings in BOTH engines
(see functions/determinism.py for why raw timestamps are banned from
checked output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import fmt_date

LINEITEM_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
]


def lineitem_select(df: DataFrame) -> list[Column]:
    return [F.col(c) for c in LINEITEM_COLS] + [fmt_date("l_shipdate", "l_shipdate")]


LINEITEM_SQL = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_tax, l_returnflag, l_linestatus, "
    "strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate"
)

ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def orders_select(df: DataFrame) -> list[Column]:
    return [F.col(c) for c in ORDERS_COLS] + [fmt_date("o_orderdate", "o_orderdate")]


ORDERS_SQL = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority, "
    "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate"
)
