#!/usr/bin/env python
"""Probe (r15, read-only): alternate [14 queries -> lsh] rounds with
and without a Python gc.collect() (+ short ContextCleaner drain)
before lsh, several times in ONE session, probe-stamped per round.
If gc-rounds are consistently faster, the in-sequence lsh penalty is
lingering driver refs (broadcast / localCheckpoint blocks held by
uncollected py4j objects squeezing the 1 GiB executor heap).
"""

from __future__ import annotations

import gc
import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else "/root/testdata/sf0.1"
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 6

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from mldag_spark.session import recommended_session_confs

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-lsh-gc-alternating")
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

    for n in others:
        run(n)
    run("dedup_minhash_lsh")

    nogc, withgc = [], []
    for r in range(rounds):
        do_gc = r % 2 == 1
        for n in others:
            run(n)
        if do_gc:
            gc.collect()
            time.sleep(1.5)
        t = run("dedup_minhash_lsh")
        (withgc if do_gc else nogc).append(t)
        print(f"round {r} gc={do_gc}: lsh={t} probe={probe()}", flush=True)

    print(f"\nno-gc rounds:   {nogc}  min={min(nogc)}")
    print(f"with-gc rounds: {withgc}  min={min(withgc)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
