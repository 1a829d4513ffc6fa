#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}.

Timing rules (SURVEY.md §5.5): one action per query via a noop-format
write (full plan executes, nothing is collected to the driver — collect
would measure Python serialization, not the engine), no caching, warm
session (JVM startup excluded; it is reported separately as
"startup_sec" inside the JSON for honesty).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hbasemapreduce_spark.catalog import configure  # noqa: E402
from hbasemapreduce_spark.registry import all_specs  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    t0 = time.perf_counter()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hbasemapreduce_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")  # keep the JSON line clean
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)
    startup = time.perf_counter() - t0

    specs = all_specs()
    # Warm-up (untimed): exercises the noop writer, parquet footer reads,
    # codegen and the Python-worker pool so the first timed query isn't
    # charged for one-time session costs.
    for wk in ("agg_rowcount", "scan_project", "udf_scalar_pandas"):
        specs[wk].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for key, spec in specs.items():
        t = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[key] = round(time.perf_counter() - t, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # One COMPACT line: the driver captures only a tail of stdout (r1 lost
    # the head of a ~4 KB pretty line -> "parsed": null), so no spaces.
    line = json.dumps(
        {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf else None,
            "n_queries": len(timings),
            "startup_sec": round(startup, 2),
        },
        separators=(",", ":"),
    )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
