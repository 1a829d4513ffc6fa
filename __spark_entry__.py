"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``hbasemapreduce_spark`` package; this file
is a thin adapter over its registry (see SURVEY.md §2 for the key
inventory and hbasemapreduce_spark/registry.py for the determinism
contract that makes the hashes match).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbasemapreduce_spark import registry  # noqa: E402
from hbasemapreduce_spark.catalog import configure  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: join_star (scan + filter + 4 joins +
    aggregate — touches the whole star schema). Driver checks rows>0."""
    configure(spark)
    return registry.queries()["join_star"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every hash-checked key; keys
    omitted here (approx sketches, LSH banding, float-path custom
    stats) get the driver's weaker rows-only check."""
    return registry.oracle_sql()
