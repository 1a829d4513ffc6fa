"""Client Scan-builder surface: compiles to the same optimized plan as
hand-written DataFrame code (pushdown/pruning intact), stays lazy, and
matches semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbasemapreduce_spark.catalog import load_table
from hbasemapreduce_spark.client import Table

from .conftest import SF_DIR


def _table(spark):
    return Table(spark, SF_DIR, "orders", row_key="o_orderkey")


def _optimized(df) -> str:
    import re

    # expression IDs (#7L, #12) differ between two analyses of the same
    # query; strip them so the comparison is structural
    return re.sub(r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString())


def test_scan_compiles_to_handwritten_plan(spark):
    built = (
        _table(spark)
        .scan()
        .with_start_row(100)
        .with_stop_row(5000)
        .with_filter(F.col("o_totalprice") > 1000.0)
        .add_columns("o_orderkey", "o_totalprice")
        .to_df()
    )
    hand = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") >= 100)
        .filter(F.col("o_orderkey") < 5000)
        .filter(F.col("o_totalprice") > 1000.0)
        .select("o_orderkey", "o_totalprice")
    )
    assert _optimized(built) == _optimized(hand)


def test_scan_filters_push_to_parquet(spark):
    df = (
        _table(spark)
        .scan()
        .with_start_row(100)
        .with_filter(F.col("o_totalprice") > 1000.0)
        .add_columns("o_orderkey")
        .to_df()
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(o_orderkey,100)" in plan  # inside PushedFilters
    # projection pruned the ReadSchema to the two referenced columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan


def test_scan_builder_is_immutable_and_forkable(spark):
    base = _table(spark).scan().with_start_row(100)
    narrow = base.with_stop_row(200)
    wide = base.with_stop_row(50000)
    assert narrow.to_df().count() < wide.to_df().count()
    # forking `narrow` did not mutate `base`
    assert base.to_df().count() == wide.to_df().count() + (
        base.with_filter(F.col("o_orderkey") >= 50000).to_df().count()
    )


def test_scan_prefix_and_limit_semantics(spark):
    parts = Table(spark, SF_DIR, "part", row_key="p_name")
    got = parts.scan().with_prefix("small").with_limit(10).to_df().collect()
    assert 0 < len(got) <= 10
    assert all(r.p_name.startswith("small") for r in got)
    # limited page is deterministic: re-running yields the same rows
    again = parts.scan().with_prefix("small").with_limit(10).to_df().collect()
    assert got == again


def test_group_helpers_match_dataframe_agg(spark):
    scan = _table(spark).scan().with_filter(F.col("o_totalprice") > 100000.0)
    via_client = {
        (r.o_orderpriority, r.cnt)
        for r in scan.group_count("o_orderpriority").collect()
    }
    via_df = {
        (r.o_orderpriority, r.cnt)
        for r in load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_totalprice") > 100000.0)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert via_client == via_df
    named = scan.group_agg(
        ["o_orderpriority"], n=F.count("*"), max_price=F.max("o_totalprice")
    )
    assert set(named.columns) == {"o_orderpriority", "n", "max_price"}


def test_read_versions_keeps_n_newest_per_cell(spark):
    from hbasemapreduce_spark.client import Scan

    events = load_table(spark, SF_DIR, "events")
    got = (
        Scan(events, "user_id")
        .add_columns("user_id", "event_type", "ts", "event_id")
        .read_versions(2, ts_col="ts", qualifier_cols=["event_type"], tiebreak_col="event_id")
    )
    rows = got.collect()
    # at most n versions per (row, qualifier) cell, ranked from 1
    from collections import Counter

    per_cell = Counter((r.user_id, r.event_type) for r in rows)
    assert max(per_cell.values()) <= 2
    assert {r.version for r in rows} <= {1, 2}
    # version 1 of a cell is its true max-ts event
    import pyspark.sql.functions as F

    true_max = {
        (r.user_id, r.event_type): r.m
        for r in events.groupBy("user_id", "event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    }
    for r in rows:
        if r.version == 1:
            assert r.ts == true_max[(r.user_id, r.event_type)]
