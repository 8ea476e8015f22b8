#!/usr/bin/env python
"""SemDeDup production-k datapoint (VERDICT r10 #4).

The registered gate query runs k=8 (gate-sized so the unrolled SQL
oracle stays tractable); the docstring claims production k scales with
N and "only the literal count changes". This measures that claim:
dedup_semantic_clusters end-to-end at sf3.0 with k=8 vs k=64 in one
session (interleaved), recording both walls and the ratio under the
row's ``k_scan`` key in SCALING.json.

What grows with k, mechanically: the assignment expression has k
distance terms (codegen work per row ~k·d), the Lloyd shuffle carries
k keys (still bounded), and the centroid collect is k rows. What
SHRINKS with k: clusters are smaller, so within-cluster window pairing
has fewer same-(cid,bkt) collisions. Net effect is what this measures.

Usage: python scripts/probe_semdedup_kscan.py [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".testdata", "sf3.0"))
    a = ap.parse_args()

    from scripts.bench_scaling import _make_spark

    spark = _make_spark("4g", cores=16, shuffle=64)
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.queries.vectors import dedup_semantic_clusters

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003)"
        ).collect()
        return round(time.time() - t0, 3)

    def run(k: int) -> float:
        t0 = time.time()
        dedup_semantic_clusters(spark, a.sf_dir, k=k).write.mode(
            "overwrite"
        ).format("noop").save()
        spark.catalog.clearCache()
        return round(time.time() - t0, 3)

    # warm both plans
    warm = "/root/testdata/sf0.01"
    for k in (8, 64):
        dedup_semantic_clusters(spark, warm, k=k).write.mode(
            "overwrite"
        ).format("noop").save()
        spark.catalog.clearCache()

    p0 = probe()
    walls: dict[int, list[float]] = {8: [], 64: []}
    for _ in range(max(a.repeats, 2)):
        for k in (8, 64):  # interleaved, same session
            walls[k].append(run(k))
    p1 = probe()

    row = {
        "sf_dir": a.sf_dir,
        "k8_sec": min(walls[8]),
        "k64_sec": min(walls[64]),
        "k8_walls": walls[8],
        "k64_walls": walls[64],
        "ratio_k64_over_k8": round(min(walls[64]) / min(walls[8]), 2),
        "probe_pre": p0,
        "probe_post": p1,
    }
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        data = json.load(f)
    data["queries"]["dedup_semantic_clusters"]["k_scan"] = row
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(row))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
