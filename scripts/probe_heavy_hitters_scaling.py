#!/usr/bin/env python
"""Scale row for heavy hitters (``text_heavy_hitters``).

Compares the two-pass Misra-Gries sketch path against the full
groupBy-threshold formulation on the corpus token stream at
sf1/sf3/sf10. The sketch's claim is a SHUFFLE bound (<= k rows per
partition map-side, candidate-only exact pass), not a local-wall win:
at local scale the token domain is small enough that the full
aggregate's map-side partial combine already crushes the shuffle, so
the honest expectation is parity-or-loss on wall — the binary-ANN
honest-negative pattern. Record both walls plus the measured distinct
count so the row says which regime pays for the sketch (the
structural shuffle bound is stated, not metered — the local status
API does not expose per-query shuffle bytes cleanly). Measured r15:
the synthetic corpus holds only 157-1,417 distinct tokens, a domain
where map-side partial combine is near-free, so the sketch loses
2-3x on wall while matching exactly — its regime (domains too large
for map-side hash combine) is structurally out of local reach.
Clean-flanked per the standard protocol.
Usage: python scripts/probe_heavy_hitters_scaling.py [--commit] [--sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_GATE = 0.85
K = 200


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--sf10", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .appName("heavy-hitters-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.functions import tokenize
    from mldag_spark.operators.sketches import heavy_hitters_exact

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003)"
        ).collect()
        return round(time.time() - t0, 3)

    sfs = {
        "sf1.0": os.path.join(REPO, ".testdata/sf1.0"),
        "sf3.0": os.path.join(REPO, ".testdata/sf3.0"),
    }
    if args.sf10:
        sfs["sf10"] = os.path.join(REPO, ".testdata/sf10")

    probe()  # JIT warm-up

    out = {"session": "local[16]@6g/64", "probe_gate": PROBE_GATE,
           "k": K, "points": {}}
    for sf, d in sfs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        ex = docs.select(F.explode(tokenize(F.col("text"))).alias("w"))
        point = {"pre_probe": probe()}

        t0 = time.time()
        full = (
            ex.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
            .crossJoin(F.broadcast(
                ex.select(F.count(F.lit(1)).alias("_n"))
            ))
            .filter(F.col("cnt") * K > F.col("_n"))
        )
        full_rows = sorted((r["w"], r["cnt"]) for r in full.collect())
        point["full_groupby_wall_sec"] = round(time.time() - t0, 3)
        point["n_distinct_tokens"] = ex.select("w").distinct().count()

        t0 = time.time()
        sk = heavy_hitters_exact(ex, "w", K)
        sk_rows = sorted((r["w"], r["cnt"]) for r in sk.collect())
        point["sketch_wall_sec"] = round(time.time() - t0, 3)

        point["n_heavy"] = len(sk_rows)
        point["results_match"] = sk_rows == full_rows
        point["post_probe"] = probe()
        point["clean_flanks"] = (
            point["pre_probe"] <= PROBE_GATE
            and point["post_probe"] <= PROBE_GATE
        )
        out["points"][sf] = point
        print(json.dumps({sf: point}), file=sys.stderr)

    print(json.dumps(out))
    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        data = json.load(open(path))
        data["heavy_hitters"] = out
        json.dump(data, open(path, "w"), indent=1)
        print("committed SCALING.json: heavy_hitters", file=sys.stderr)


if __name__ == "__main__":
    main()
