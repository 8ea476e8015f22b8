#!/usr/bin/env python
"""Scale evidence for the binary-quantization ANN pair (r14).

The claim worth money: the sign-sketch Hamming scan touches 16 B per
64-d vector instead of 512 B of doubles, all-JVM popcount — so the
coarse+refine composition should beat the exact float scan as the
corpus grows, at the measured recall operating point (refine=200 →
>= 0.9 recall@5, pinned by test). This probe measures
``binary_sign_topk(refine=200)`` against both brute-force baselines
(JVM expression + Arrow/BLAS) at sf1.0/sf3.0/sf10, clean-flanked.

Usage: python scripts/probe_hamming_scaling.py [--commit] [--sf10]
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

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .appName("hamming-ann-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.operators.similarity import (
        binary_sign_topk,
        brute_force_topk,
        brute_force_topk_arrow,
    )

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

    probe()  # JIT warm-up; also warm each variant's codegen at sf0.001
    warm = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    wq = warm.filter(F.col("vec_id") < 10)
    for fn, kw in (
        (binary_sign_topk, {"refine": 200}),
        (brute_force_topk, {}),
        (brute_force_topk_arrow, {}),
    ):
        fn(warm, wq, k=5, **kw).write.mode("overwrite").format(
            "noop"
        ).save()

    out = {"session": "local[16]@6g/64", "probe_gate": PROBE_GATE,
           "refine": 200, "points": {}}
    for sf, d in sfs.items():
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        q = emb.filter(F.col("vec_id") < 10)
        point = {"pre_probe": probe(), "n_vectors": emb.count()}
        for label, fn, kw in (
            ("hamming_refined", binary_sign_topk, {"refine": 200}),
            ("brute_jvm", brute_force_topk, {}),
            ("brute_arrow", brute_force_topk_arrow, {}),
        ):
            t0 = time.time()
            fn(emb, q, k=5, **kw).write.mode("overwrite").format(
                "noop"
            ).save()
            point[f"{label}_sec"] = round(time.time() - t0, 3)
        # recall of the refined path vs the exact baseline at this sf
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(emb, q, k=5).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in binary_sign_topk(emb, q, k=5, refine=200).collect()
        }
        point["recall_at_5"] = round(len(exact & got) / len(exact), 3)
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
        data["hamming_ann"] = out
        json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
