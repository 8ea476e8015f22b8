#!/usr/bin/env python
"""A/B probe (r15, read-only): spark.sql.codegen.cache.maxEntries
(default 100) vs a bench-pass-sized value. One full headline pass
generates well over 100 codegen classes, so with the default every
pass recompiles every stage's generated code - the query with the most
codegen units (dedup_minhash_lsh) pays the most. Two sessions, same
query sequence, interleaved within each session; probe stamped.
"""

from __future__ import annotations

import os
import sys
import time


def run_case(max_entries: str | None, sf_dir: str) -> None:
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from mldag_spark.session import recommended_session_confs

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"probe-codegen-cache-{max_entries or 'default'}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # engine-contract confs from the package's single definition
        # (r16, VERDICT r15 #2): AQE, bucketed-scan ordering, subset
        # co-partition reuse — identical to the bench/tests sessions
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if max_entries is not None:
        b = b.config("spark.sql.codegen.cache.maxEntries", max_entries)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from mldag_spark.queries import REGISTRY

    names = [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "q6_revenue_forecast",
        "q10_returned_items", "window_topk_orders_per_customer",
        "agg_rollup_flag_status", "events_sessionization",
        "events_asof_latest_order", "dedup_exact", "dedup_minhash_lsh",
        "text_quality_score", "ann_cosine_topk",
        "text_boilerplate_chunks", "text_bigram_surprisal",
    ]

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr("sum((id * id) % 1000003)").collect()
        return round(time.time() - t0, 3)

    walls: dict[str, list[float]] = {n: [] for n in names}
    for n in names:  # warmup pass
        REGISTRY[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
    probes = []
    for _ in range(3):
        for n in names:
            t0 = time.time()
            REGISTRY[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls[n].append(round(time.time() - t0, 3))
        probes.append(probe())
    total = sum(min(v) for v in walls.values())
    print(f"case maxEntries={max_entries or 'default(100)'}: "
          f"total(sum-of-mins)={round(total, 3)} probes={probes}", flush=True)
    for n in names:
        print(f"  {min(walls[n]):7.3f}  {walls[n]}  {n}", flush=True)
    spark.stop()


def main() -> int:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    order = sys.argv[sys.argv.index("--order") + 1] if "--order" in sys.argv else "big-first"
    cases = ["4096", None] if order == "big-first" else [None, "4096"]
    for c in cases:
        run_case(c, sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
