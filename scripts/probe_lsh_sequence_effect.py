#!/usr/bin/env python
"""Probe (r15, read-only): why dedup_minhash_lsh runs ~2x slower inside
a full bench pass than isolated in the same kind of session.

Phases (one session, bench confs):
  A. lsh alone x3 (after one warmup)        -> isolated floor
  B. [14 other headline queries, lsh] x2    -> in-sequence reading
  C. same as B but gc.collect() + a short ContextCleaner drain pause
     before lsh                             -> is it lingering driver
     refs (checkpoint blocks / broadcasts) or something else?
"""

from __future__ import annotations

import gc
import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else "/root/testdata/sf0.1"

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from mldag_spark.session import recommended_session_confs

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-lsh-sequence")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # engine-contract confs from the package's single definition
        # (r16, VERDICT r15 #2): AQE, bucketed-scan ordering, subset
        # co-partition reuse — identical to the bench/tests sessions
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mldag_spark.queries import REGISTRY

    others = [
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "q6_revenue_forecast",
        "q10_returned_items", "window_topk_orders_per_customer",
        "agg_rollup_flag_status", "events_sessionization",
        "events_asof_latest_order", "dedup_exact", "text_quality_score",
        "ann_cosine_topk", "text_boilerplate_chunks",
        "text_bigram_surprisal",
    ]

    def run(name: str) -> float:
        t0 = time.time()
        REGISTRY[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr("sum((id * id) % 1000003)").collect()
        return round(time.time() - t0, 3)

    run("dedup_minhash_lsh")  # warm
    a = [run("dedup_minhash_lsh") for _ in range(3)]
    print(f"A isolated: {a} probe={probe()}", flush=True)

    b = []
    for _ in range(2):
        for n in others:
            run(n)
        b.append(run("dedup_minhash_lsh"))
    print(f"B in-sequence: {b} probe={probe()}", flush=True)

    c = []
    for _ in range(2):
        for n in others:
            run(n)
        gc.collect()
        time.sleep(2.0)  # let ContextCleaner drain the freed refs
        c.append(run("dedup_minhash_lsh"))
    print(f"C gc-before-lsh: {c} probe={probe()}", flush=True)

    a2 = [run("dedup_minhash_lsh") for _ in range(2)]
    print(f"A2 isolated again: {a2} probe={probe()}", flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
