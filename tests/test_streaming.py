"""§2.8 streaming mirrors: prove the batch expressions run incrementally
and (where the sink mode allows a full view) agree with the batch twin.
"""

from __future__ import annotations

from hbasemapreduce_spark.registry import all_specs
from hbasemapreduce_spark.streaming.mirrors import run_mirror_to_memory

from .conftest import SF_DIR


def test_stream_tumbling_matches_batch(spark):
    got = run_mirror_to_memory(spark, SF_DIR, "stream_tumbling", output_mode="complete")
    batch = all_specs()["stream_tumbling"].fn(spark, SF_DIR)
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_stream_session_counts(spark):
    got = run_mirror_to_memory(spark, SF_DIR, "stream_session", output_mode="complete")
    rows = got.collect()
    assert len(rows) > 0
    # same number of (user, session) groups as the batch sessionizer
    batch_n = all_specs()["stream_session"].fn(spark, SF_DIR).count()
    assert len(rows) == batch_n


def test_stream_dedup_append(spark):
    got = run_mirror_to_memory(spark, SF_DIR, "stream_dedup", output_mode="append")
    batch_n = all_specs()["stream_dedup"].fn(spark, SF_DIR).count()
    assert got.count() == batch_n


def test_stream_stateful_matches_batch(spark):
    # applyInPandasWithState profile must agree with the batch aggregate
    # (single availableNow pass: every user's final update is its only
    # update in the memory sink).
    got = run_mirror_to_memory(spark, SF_DIR, "x_stream_stateful", output_mode="update")
    batch = all_specs()["x_stream_stateful"].fn(spark, SF_DIR)
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b
