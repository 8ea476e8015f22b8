"""Probe (VERDICT r8 #4): attribute embedding_near_dup_blocked's sf10
ratio (21.39 in the r8 table) by splitting the op into its stages at
100x data, the same way probe_ppjoin_positional.py attributed the
jaccard join.

Stages (cumulative noop writes of the production frames exposed by
queries.vectors._near_dup_frames — the probe times exactly what the
gate runs):
  sig   — banded signature explode + the bucket-window rank
  cand  — + windowed self-join + pair distinct
  qual  — + two verify joins + exact cosine threshold
  full  — + the per-vector top-K output window (the public query)
Per-stage time ~ difference of consecutive cumulative walls (the same
warm subtree rides every later frame). Row counts are printed so the
bound's selectivity is visible, not just its wall effect.

Run:  python scripts/probe_neardup_stages.py --sf .testdata/sf10 \
          --cores 16 --heap 4g --shuffle 640
Prints one JSON line.
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
    ap.add_argument("--sf", default=os.path.join(REPO, ".testdata", "sf10"))
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--heap", default="4g")
    ap.add_argument("--shuffle", type=int, default=640)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from scripts.bench_scaling import _make_spark

    spark = _make_spark(args.heap, cores=args.cores, shuffle=args.shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.queries.vectors import (
        _near_dup_frames,
        embedding_near_dup_blocked,
    )

    # fixed-work host probe, same anchor protocol as bench.py /
    # bench_scaling.py — stamped on the output line
    t0 = time.time()
    spark.range(1_000_000_000).selectExpr("sum((id * id) % 1000003)").collect()
    probe = round(time.time() - t0, 3)

    frames = _near_dup_frames(spark, args.sf)
    cumulative = [
        ("sig", frames["signatures"]),
        ("cand", frames["candidates"]),
        ("qual", frames["qualifying"]),
        ("full", embedding_near_dup_blocked(spark, args.sf)),
    ]

    out = {
        "sf": args.sf,
        "cores": args.cores,
        "shuffle": args.shuffle,
        "probe_spark_range": probe,
        "cumulative_sec": {},
        "stage_sec": {},
        "rows": {},
    }
    prev = 0.0
    prev_name = None
    for name, df in cumulative:
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        out["cumulative_sec"][name] = round(best, 3)
        label = name if prev_name is None else f"{prev_name}->{name}"
        out["stage_sec"][label] = round(best - prev, 3)
        out["rows"][name] = df.count()
        prev, prev_name = best, name

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
