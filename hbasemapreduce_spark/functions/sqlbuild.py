"""Build DataFrames through one-shot ``spark.sql`` calls over short-lived
temp views — the driver-side plan-construction optimization (r12).

Why: classic PySpark analyzes the ENTIRE logical plan eagerly on every
DataFrame-returning call, and each Column object is a py4j round trip.
For wide pipelines (a 128-accumulator MinHash aggregate, a banded
self-join, an unrolled iterative graph round) the incremental
re-analysis is O(ops x tree size) and measured in SECONDS of driver
time per query build on this box — more than the query's own execution
at bench scale, and a real cost on a cluster driver too (guide §7.3:
planning time as a driver bottleneck; §3.3: very large plans).  One
``spark.sql`` call parses and analyzes the same tree ONCE.

The helper registers each input DataFrame as a uniquely-named temp view,
formats the SQL template with the view names, and drops the views
immediately — the returned DataFrame owns the analyzed plan, so the
views are only needed during analysis.  Results are IDENTICAL to the
equivalent DataFrame-API formulation (same expressions, same operator
tree); every converted operator is A/B-proven bit-identical against its
pre-conversion output and its DuckDB oracle.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_VIEW_SEQ = itertools.count()


def sql_over(sql: str, **views: DataFrame) -> DataFrame:
    """Run ``spark.sql(sql.format(<name>=view_name, ...))`` with each
    keyword DataFrame registered as a transient temp view.

    The template references inputs as ``{name}``; literal braces in the
    SQL must be doubled.  Views are dropped before returning — the
    analyzed plan keeps its own reference to the underlying relations.
    """
    if not views:
        raise ValueError("sql_over needs at least one input DataFrame")
    spark = next(iter(views.values())).sparkSession
    names: dict[str, str] = {}
    try:
        for k, df in views.items():
            name = f"_sqlb_{k}_{next(_VIEW_SEQ)}"
            df.createOrReplaceTempView(name)
            names[k] = name
        return spark.sql(sql.format(**names))
    finally:
        for name in names.values():
            spark.catalog.dropTempView(name)
