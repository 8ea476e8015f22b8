#!/usr/bin/env python
"""AQE-coalescing conf probe for dedup_minhash_lsh's steady-state floor
(r16, VERDICT r15 #4).

r15 stage attribution: the query's ~1.4 s steady-state wall is
dominated by inter-stage AQE re-planning gaps across ~13 stages, not
task time. The runtime-settable AQE coalescing knobs are the only
levers that change that without abandoning AQE (r12 measured AQE-off
as a net loss). This probe A/Bs each variant against the shipped
defaults INTERLEAVED in one session (ABBA blocks, per-block sum
ratios — the bench canary estimator), plus the executed plan's stage
count per variant.

Variants (spark.conf.set, all runtime-settable):
  base    shipped defaults (advisory 64m, parallelismFirst=true)
  pfirst  coalescePartitions.parallelismFirst=false (coalesce to the
          advisory size instead of max parallelism: fewer, larger
          reduce tasks -> less per-stage scheduling work)
  adv16   advisoryPartitionSizeInBytes=16m
  nocoal  coalescePartitions.enabled=false

Usage: python scripts/probe_lsh_aqe_coalesce.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
from mldag_spark.session import recommended_session_confs  # noqa: E402


VARIANTS = {
    "pfirst": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "adv16": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    },
    "nocoal": {
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
}


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
        if a == "--reps":
            reps = int(sys.argv[i + 1])

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lsh-aqe-coalesce-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    fn = qs["dedup_minhash_lsh"]

    defaults = {
        k: spark.conf.get(k)
        for ks in VARIANTS.values()
        for k in ks
    }

    def set_confs(d: dict) -> None:
        for k, v in d.items():
            spark.conf.set(k, v)

    def run() -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    # warmup to steady state under defaults
    walls = [run() for _ in range(3)]
    print(json.dumps({"warmup": walls}), flush=True)

    out = {}
    for name, confs in VARIANTS.items():
        block_ratios = []
        a_runs, b_runs = [], []
        for rep in range(reps):
            order = ["a", "b", "b", "a"] if rep % 2 == 0 else \
                    ["b", "a", "a", "b"]
            walls = {}
            acc = {"a": 0.0, "b": 0.0}
            for side in order:
                if side == "a":
                    set_confs(defaults)
                else:
                    set_confs({**defaults, **confs})
                t = run()
                acc[side] += t
            set_confs(defaults)
            a_runs.append(acc["a"])
            b_runs.append(acc["b"])
            if acc["a"] > 0:
                block_ratios.append(round(acc["b"] / acc["a"], 3))
        out[name] = {
            "block_ratios": block_ratios,
            "ratio_median": round(statistics.median(block_ratios), 3),
            "a_block_sums": a_runs,
            "b_block_sums": b_runs,
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "results": out}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
