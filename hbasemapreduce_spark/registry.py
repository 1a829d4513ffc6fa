"""Query registry: the single source of truth behind __spark_entry__.py.

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator with (a) a pure function ``(spark, sf_dir) -> DataFrame`` and
(b) an optional DuckDB-runnable ANSI-SQL oracle string.  Keys with an
oracle get the driver's full row-count + schema + value-hash check;
keys without one get the weaker rows-only check (SURVEY.md §2 marks
which — approx/float-path/map-ordering cases).

Determinism contract (SURVEY.md §2 "determinism rules"):
- every computed column is aliased identically in Spark and SQL;
- no raw TIMESTAMP column ever appears in checked output (epoch
  bigints or formatted strings instead — pandas dtype-stable across
  Spark and DuckDB);
- float aggregates use the decimal-sandwich helpers in
  functions/determinism.py so results are bit-identical regardless of
  partitioning / addition order;
- limit/top-k queries carry total (tie-broken) orderings.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

_OPERATOR_MODULES = [
    "hbasemapreduce_spark.operators.scans",
    "hbasemapreduce_spark.operators.filters",
    "hbasemapreduce_spark.operators.joins",
    "hbasemapreduce_spark.operators.aggregates",
    "hbasemapreduce_spark.operators.windows",
    "hbasemapreduce_spark.operators.sorts_sets",
    "hbasemapreduce_spark.operators.scalars",
    "hbasemapreduce_spark.operators.streaming_batch",
    "hbasemapreduce_spark.operators.llm_text",
    "hbasemapreduce_spark.operators.llm_dedup",
    "hbasemapreduce_spark.operators.llm_similarity",
    "hbasemapreduce_spark.operators.llm_multimodal",
    "hbasemapreduce_spark.operators.udx",
    "hbasemapreduce_spark.operators.extras",
    "hbasemapreduce_spark.operators.pipeline",
    "hbasemapreduce_spark.operators.clustering",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None for rows-only keys
    category: str


def query(name: str, *, category: str, oracle: str | None = None):
    """Register a query function under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(sorted(_REGISTRY.items()))


def queries() -> dict[str, QueryFn]:
    return {k: spec.fn for k, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: spec.oracle for k, spec in all_specs().items() if spec.oracle is not None}
