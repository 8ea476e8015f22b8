#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a full action (``df.write.format("noop")`` —
executes the whole plan without driver-side collection overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time


# The headline set: one per operator family, weighted toward the
# shuffling/joining queries that dominate at scale.
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "window_topk_orders_per_customer",
    "agg_rollup_flag_status",
    "events_sessionization",
    "events_asof_latest_order",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "ann_cosine_topk",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mldag_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NB: do NOT raise spark.driver.memory here. On this host a large
        # (8-16g) heap makes the local-mode JVM intermittently freeze for
        # minutes (jstack cannot even attach); with the default heap the
        # same query sequence is stable and ~10x faster end-to-end.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup at the smallest SF: compiles/JITs every generated stage of
    # the exact headline plans so the timed sf run measures steady-state
    # throughput, not first-query codegen (set SPARK_GRAFT_WARMUP=0 to
    # include cold-start in the measurement).
    if os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0":
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir):
            for name in HEADLINE:
                try:
                    qs[name](spark, warm_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                except Exception:
                    pass

    # Host-load hygiene: this machine's background load makes a single
    # pass swing 10.7-16s for identical code, which would masquerade as
    # a regression round-over-round. Each query therefore runs
    # SPARK_GRAFT_REPEATS times (default 2) and reports the per-query
    # MIN; all raw passes plus the 1-minute loadavg are recorded so a
    # reviewer can judge noise.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "2")))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(repeats):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs[name].append(round(time.time() - t0, 3))
            except Exception as e:  # keep the bench line parseable on error
                print(f"bench error in {name}: {e}", file=sys.stderr)
                runs[name].append(-1.0)

    times = {
        name: (min(ok) if (ok := [t for t in ts if t >= 0]) else -1.0)
        for name, ts in runs.items()
    }
    total = round(sum(t for t in times.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                "runs": runs,
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
