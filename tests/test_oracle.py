"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 — the local pre-flight for the driver's t2 gate (SURVEY.md §5.3).

Keys without an oracle get a smoke run (executes + stable schema).
"""

from __future__ import annotations

import pytest

from hbasemapreduce_spark.registry import all_specs

from .conftest import SF_DIR, assert_frames_match

SPECS = all_specs()
ORACLE_KEYS = [k for k, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY_KEYS = [k for k, s in SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_match(spark, oracle, key):
    spec = SPECS[key]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    duck_pdf = oracle.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, key):
    spec = SPECS[key]
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
