#!/usr/bin/env python
"""The binary-sketch WIDEN knob's measured artifact (r15, VERDICT r14
#3 + what's-missing #1).

SCALING ``hamming_ann`` measured the 64-bit (1 bit/dim) sketch's
recall@5 collapsing 0.90 → 0.46 at fixed refine=200 as the corpus
grew to 200k vectors, and prescribed "more sketch bits via rotations"
— but the cure existed only as prose. This probe measures the cure
the code now ships (``binary_sign_topk(n_bits=)``, avalanche-family
rotations ``det_rotation_weights``) at exactly the regime the cliff
was measured in: the sf10 embeddings table (200k vectors), 10
queries, recall@5 against exact numpy ground truth, refine=200 and
the starved refine=50.

It also records the NEGATIVE control that shaped the implementation:
widening with the linear LSH-banding family
(``det_hyperplane_weights`` — rows near-translates of each other)
measured recall BELOW the native sketch (0.18 → 0.04 at 20k/R=50),
which is why the widen path has its own weight family.

Usage: python scripts/probe_hamming_widen.py [--commit] [--sf10]
(without --sf10: sf1.0/sf3.0 only)
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

    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .appName("hamming-widen")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.operators.similarity import binary_sign_topk

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
    K, NQ = 5, 10
    out = {
        "session": "local[16]@6g/64",
        "probe_gate": PROBE_GATE,
        "k": K,
        "n_queries": NQ,
        "points": {},
    }
    for sf, d in sfs.items():
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        point = {"pre_probe": probe(), "n_vectors": emb.count()}
        # exact ground truth on the driver: a probe-only collect (the
        # product path never does this) — 200k x 64 doubles = 100 MB
        rows = emb.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        X = np.array([r["embedding"] for r in rows], dtype=np.float64)
        order = np.argsort(ids)
        ids, X = ids[order], X[order]
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Xn = X / norms
        qpos = np.searchsorted(ids, np.arange(NQ))
        sims = Xn[qpos] @ Xn.T
        truth = {}
        for i in range(NQ):
            s = sims[i].copy()
            s[qpos[i]] = -2
            top = np.argpartition(-s, K)[:K]
            truth[i] = set(ids[top[np.argsort(-s[top])]].tolist())
        q = emb.filter(F.col("vec_id") < NQ)
        for refine in (50, 200):
            for n_bits in (None, 256, 512):
                t0 = time.time()
                res = binary_sign_topk(
                    emb, q, k=K, refine=refine, n_bits=n_bits
                ).collect()
                wall = round(time.time() - t0, 3)
                got = {}
                for r in res:
                    got.setdefault(r["query_id"], set()).add(
                        r["neighbor_id"]
                    )
                rec = sum(
                    len(got.get(i, set()) & truth[i]) for i in range(NQ)
                ) / (NQ * K)
                key = f"recall@5_R{refine}_bits{n_bits or 'native64'}"
                point[key] = round(rec, 3)
                point[key + "_wall_sec"] = wall
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
        data["hamming_ann"]["widen"] = out
        json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
