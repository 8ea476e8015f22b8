#!/usr/bin/env python
"""PQ / IVF-PQ operating-point curves (VERDICT r11 #4).

The r11 gate pinned a single recall point (0.8 floor at gate size).
A 100 TB user picking quantizer parameters needs the FAISS-style
operating-point table: recall@k against the exact brute-force result
as a function of (m, ksub) for PQ/ADC and of n_probe for IVF-PQ, at
more than one corpus size. This probe measures exactly that on the
driver's sf0.1 embeddings (2k vectors) and the replicated sf1.0
corpus (20k vectors, scripts/gen_scale.py — within-replica cosines
exactly preserved, fixed query set), k=10, refine=100, quantizers
trained on the standard bounded 2048-vector sample.

Usage: python scripts/probe_ann_recall.py [--commit] [--sfs sf0.1,sf1.0]
Prints one JSON line; --commit merges an `ann_operating_points` block
into SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1.0": os.path.join(REPO, ".testdata/sf1.0"),
}
K = 10
REFINE = 100
N_QUERIES = 10          # the fixed ANN query-set convention (vec_id < 10)
PQ_GRID = [(8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (16, 256)]
IVFPQ_M, IVFPQ_KSUB, IVFPQ_LISTS = (16, 16, 16)
NPROBES = [1, 2, 4, 8, 16]


def recall_at_k(approx_rows, truth: dict) -> float:
    """fraction of true top-K pairs recovered, averaged over queries."""
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for qid, true_ids in truth.items():
        recalls.append(len(got.get(qid, set()) & true_ids) / len(true_ids))
    return round(sum(recalls) / len(recalls), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--sfs", default="sf0.1,sf1.0")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("ann-recall-curves")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.operators.similarity import (
        brute_force_topk_arrow,
        ivfpq_topk,
        ivfpq_train,
        pq_topk,
        pq_train,
    )
    from mldag_spark.queries.vectors import _train_sample

    out = {"k": K, "refine": REFINE, "n_queries": N_QUERIES, "curves": {}}
    for sf in args.sfs.split(","):
        path = os.path.join(SF_DIRS[sf], "embeddings.parquet")
        emb = spark.read.parquet(path).persist()
        n = emb.count()
        q = emb.filter(F.col("vec_id") < N_QUERIES)

        truth: dict[int, set] = {}
        for r in brute_force_topk_arrow(emb, q, k=K).collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        sample = _train_sample(emb)
        pq_curve = {}
        for m, ksub in PQ_GRID:
            books = pq_train(sample, m=m, ksub=ksub)
            t = time.time()
            rows = pq_topk(emb, q, books, k=K, refine=REFINE).collect()
            pq_curve[f"m={m},ksub={ksub}"] = {
                "recall": recall_at_k(rows, truth),
                "code_bytes_per_vec": m,
                "query_wall_sec": round(time.time() - t, 2),
            }
            print(f"{sf} PQ m={m} ksub={ksub}: "
                  f"{pq_curve[f'm={m},ksub={ksub}']}", file=sys.stderr)

        coarse, books = ivfpq_train(
            sample, n_lists=IVFPQ_LISTS, m=IVFPQ_M, ksub=IVFPQ_KSUB
        )
        ivf_curve = {}
        for p in NPROBES:
            t = time.time()
            rows = ivfpq_topk(
                emb, q, coarse, books, k=K, n_probe=p, refine=REFINE
            ).collect()
            ivf_curve[f"n_probe={p}"] = {
                "recall": recall_at_k(rows, truth),
                "scan_fraction": round(p / IVFPQ_LISTS, 3),
                "query_wall_sec": round(time.time() - t, 2),
            }
            print(f"{sf} IVFPQ n_probe={p}: {ivf_curve[f'n_probe={p}']}",
                  file=sys.stderr)

        out["curves"][sf] = {
            "corpus_rows": n,
            "pq": pq_curve,
            "ivfpq": {
                "config": f"n_lists={IVFPQ_LISTS},m={IVFPQ_M},"
                          f"ksub={IVFPQ_KSUB}",
                "points": ivf_curve,
            },
        }
        emb.unpersist()

    print(json.dumps(out))
    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        with open(path) as f:
            scal = json.load(f)
        scal["ann_operating_points"] = out
        with open(path, "w") as f:
            json.dump(scal, f, indent=1)
        print("committed to SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
