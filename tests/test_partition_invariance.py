"""Partition-count invariance: every oracle-checked query must produce
IDENTICAL values at different shuffle-partition counts — the local
stand-in for "same answer on 8 partitions or 8000 executors", and the
property that makes the driver's value-hashes reproducible.

Catches the classic nondeterminism bugs: raw float SUM/AVG (partial
aggregation order), un-tiebroken limits/top-k, first()/head-dependent
expressions, and time-zone-sensitive paths.
"""

from __future__ import annotations

from hbasemapreduce_spark.registry import all_specs

from .conftest import SF_DIR


def _norm(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_all_oracle_queries_partition_invariant(spark):
    specs = {k: s for k, s in all_specs().items() if s.oracle is not None}
    failures = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for key, s in specs.items():
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = _norm(s.fn(spark, SF_DIR))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = _norm(s.fn(spark, SF_DIR))
            if not a.equals(b):
                failures.append(key)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert not failures, f"partition-count-sensitive results: {failures}"
