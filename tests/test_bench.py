"""Bench-harness fault isolation (VERDICT r3 item 2).

Round 3's driver bench died with rc=1 and ZERO timings because one key
(`x_cell_versions`) threw a plan-time AnalysisException and the timing
loop had no per-query try/except.  These tests prove the rewritten loop
survives a deliberately-broken spec: the breakage costs exactly one
`errors` entry and every other key still gets a timing.
"""

from __future__ import annotations

from dataclasses import dataclass

import bench


@dataclass(frozen=True)
class _FakeSpec:
    name: str
    fn: object
    oracle: str | None = None
    category: str = "test"


def _good(spark, sf_dir):
    return spark.range(5).toDF("id")


def _broken_at_plan_time(spark, sf_dir):
    df = spark.range(5).toDF("id")
    return df.select("no_such_column")  # AnalysisException at analysis


def _broken_at_build_time(spark, sf_dir):
    raise RuntimeError("query builder itself exploded")


def test_broken_key_cannot_void_the_bench(spark, tmp_path):
    specs = {
        "good_a": _FakeSpec("good_a", _good),
        "broken_plan": _FakeSpec("broken_plan", _broken_at_plan_time),
        "broken_build": _FakeSpec("broken_build", _broken_at_build_time),
        "good_b": _FakeSpec("good_b", _good),
    }
    timings, passes, errors = bench.time_queries(spark, specs, str(tmp_path))
    # the two good keys timed; the two broken keys isolated into errors
    assert set(timings) == {"good_a", "good_b"}
    assert set(errors) == {"broken_plan", "broken_build"}
    assert "AnalysisException" in errors["broken_plan"]
    assert "RuntimeError" in errors["broken_build"]
    assert all(v >= 0 for v in timings.values())


def test_all_good_keys_have_no_errors(spark, tmp_path):
    specs = {f"k{i}": _FakeSpec(f"k{i}", _good) for i in range(3)}
    timings, passes, errors = bench.time_queries(spark, specs, str(tmp_path))
    assert errors == {}
    assert set(timings) == set(specs)
