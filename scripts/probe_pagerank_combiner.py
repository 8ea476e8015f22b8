"""Probe (VERDICT r7 #7): map-side combining for PageRank's
per-iteration dst-keyed shuffle.

Question: `graph_pagerank_bipartite` showed a 100x-data ratio of 18.7;
would pre-aggregating contributions per (partition, dst) before the
dst shuffle claw some of that back?

Two things to establish honestly:

1. Whether the combiner ALREADY exists. DataFrame `groupBy(dst).agg(
   sum)` plans a partial HashAggregate before the exchange — the probe
   greps the per-iteration physical plan for `partial_sum` to confirm
   the map-side combine is present in the plan as written (if it is,
   "add a combiner" has nothing left to add at the shuffle).

2. Whether narrowing the combined rows helps. The current kernel
   persists (src, dst, w, wout) and computes `pr*w/wout` per edge per
   iteration; variant B persists the pre-divided (src, dst, frac =
   w/wout) once — one fewer 8-byte column through every iteration's
   join+shuffle and no per-row division. Same math (frac is exact
   float division either way, applied in the same order), so results
   are identical; this isolates the row-width/arith term of the
   iteration cost.

Run: python scripts/probe_pagerank_combiner.py [--sf .testdata/sf1.0]
Prints one JSON line with plan evidence + warm A/B timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from scripts.bench_scaling import _make_spark  # noqa: E402
from mldag_spark.queries.tables import load  # noqa: E402


def _edges(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 10000000).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return sym


def run_variant(spark, sf_dir, prediv: bool, iters: int = 3):
    sym = _edges(spark, sf_dir)
    outw = sym.groupBy("src").agg(F.sum("w").alias("wout"))
    if prediv:
        base = (
            sym.join(outw, "src")
            .select("src", "dst", (F.col("w") / F.col("wout")).alias("frac"))
            .persist()
        )
    else:
        base = sym.join(outw, "src").persist()
    nodes = sym.select(F.col("src").alias("id")).distinct().persist()
    try:
        n = nodes.count()
        pr = nodes.withColumn("pr", F.lit(1.0 / n))
        for i in range(iters):
            contrib = (
                F.col("pr") * F.col("frac")
                if prediv
                else F.col("pr") * F.col("w") / F.col("wout")
            )
            pr = (
                base.join(pr, F.col("src") == F.col("id"))
                .groupBy(F.col("dst").alias("nid"))
                .agg(F.sum(contrib).alias("s"))
                .select(
                    F.col("nid").alias("id"),
                    (F.lit(0.15 / n) + F.lit(0.85) * F.col("s")).alias("pr"),
                )
            )
            if i and i % 2 == 0:
                pr = pr.localCheckpoint(eager=False)
        result = (
            pr.select("id", F.round("pr", 6).alias("pagerank"))
            .orderBy(F.desc("pagerank"), "id")
            .limit(25)
        )
        plan = result._jdf.queryExecution().executedPlan().toString()
        rows = result.collect()
        return rows, plan
    finally:
        base.unpersist()
        nodes.unpersist()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(REPO, ".testdata", "sf1.0"))
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = _make_spark("2g")
    spark.sparkContext.setLogLevel("ERROR")

    # plan evidence: is the map-side combine already planned? Use a
    # single iteration — the 3-iteration kernel localCheckpoints at
    # i=2, which truncates lineage and hides the aggregate from the
    # final plan string.
    _, plan = run_variant(spark, args.sf, prediv=False, iters=1)
    partial = plan.count("partial_sum")

    out = {"sf": args.sf, "partial_sum_sites": partial, "warm": {}}
    for label, prediv in (("current", False), ("prediv_frac", True)):
        times = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            rows, _ = run_variant(spark, args.sf, prediv=prediv)
            times.append(round(time.monotonic() - t0, 2))
        out["warm"][label] = {"times": times, "min": min(times)}
        out["warm"][label]["top3"] = [
            (r.id, float(r.pagerank)) for r in rows[:3]
        ]
    a, b = out["warm"]["current"]["min"], out["warm"]["prediv_frac"]["min"]
    out["speedup_prediv"] = round(a / b, 3) if b else None
    out["results_identical"] = (
        out["warm"]["current"]["top3"] == out["warm"]["prediv_frac"]["top3"]
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
