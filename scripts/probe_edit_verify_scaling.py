#!/usr/bin/env python
"""Scale evidence for edit-distance near-dup verification (r14).

``dedup_edit_verified`` = the exact prefix-filtered miner (its own
SCALING rows stand) + two broadcast joins + per-CANDIDATE-pair
Levenshtein. The scale claim: the verify stage's marginal cost is
candidate-bounded (the dedup-rate law), not corpus-bounded — measured
here as (full − miner) at sf3.0/sf10, clean-flanked, with the pair
count recorded so marginal-per-pair is explicit.

Usage: python scripts/probe_edit_verify_scaling.py [--commit] [--sf10]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--sf10", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .appName("edit-verify-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    from mldag_spark.queries.text import dedup_ngram_jaccard

    qs = entrymod.queries()

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003)"
        ).collect()
        return round(time.time() - t0, 3)

    sfs = {"sf3.0": os.path.join(REPO, ".testdata/sf3.0")}
    if args.sf10:
        sfs["sf10"] = os.path.join(REPO, ".testdata/sf10")

    probe()
    qs["dedup_edit_verified"](
        spark, "/root/testdata/sf0.001"
    ).write.mode("overwrite").format("noop").save()

    out = {"session": "local[16]@6g/64", "probe_gate": PROBE_GATE,
           "points": {}}
    for sf, d in sfs.items():
        point = {"pre_probe": probe()}
        t0 = time.time()
        res = qs["dedup_edit_verified"](spark, d)
        point["n_pairs"] = res.count()
        point["full_wall_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        dedup_ngram_jaccard(spark, d).write.mode("overwrite").format(
            "noop"
        ).save()
        point["miner_wall_sec"] = round(time.time() - t0, 3)
        point["verify_marginal_sec"] = round(
            point["full_wall_sec"] - point["miner_wall_sec"], 3
        )
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
        data["edit_verify"] = out
        json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
