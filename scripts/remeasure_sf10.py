#!/usr/bin/env python
"""Clean-window sf10 re-measure with an unchanged-code CONTROL row.

The r9 scaling run's sf10 phase slid into a ~2x host-degradation epoch
mid-phase (probe evidence in PARITY "r9 host-epoch note"): rows
measured later in the phase read progressively worse (minhash 1.33x,
stream 1.37x, jaccard 2.6x, components 2.3x vs their r8 walls) while
their row-START probes still read clean — a 6-12 minute row can
degrade mid-flight. This script settles it:

- graph_pagerank_bipartite is the CONTROL: its code is untouched since
  its r8 sf10 measurement (127.6s). If the control re-measures near
  127s, the window is clean-epoch-equivalent and the other rows are
  trustworthy; if it reads ~2x, the window is degraded and NOTHING
  from the run may be published.
- every query is probed immediately BEFORE and AFTER its repeats; a
  row whose post-probe exceeds the gate is flagged dirty.
- results merge into SCALING.json only if --commit is passed AND the
  control lands within --control-band (default 1.25x) of its r8 wall.

Usage: python scripts/remeasure_sf10.py [--commit]
Prints one JSON line; exits 1 if the window was dirty.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONTROL = "graph_pagerank_bipartite"
CONTROL_R8_WALL = 127.588  # SCALING.json r8 sf10_sec, code untouched
TARGETS = (
    "dedup_minhash_lsh",
    "stream_incremental_dedup",
    "dedup_ngram_jaccard",
    "dedup_components",
    "text_bm25_topk",
)
SF_10 = os.path.join(REPO, ".testdata", "sf10")
ANCHOR_16C = 0.34 * 32 / 16
GATE = 1.25 * ANCHOR_16C


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--control-band", type=float, default=1.25)
    a = ap.parse_args()

    from scripts.bench_scaling import _make_spark

    spark = _make_spark("4g", cores=16, shuffle=640)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003)"
        ).collect()
        return round(time.time() - t0, 3)

    # JIT warm-up: the first probe in a fresh JVM reads 5-8s of
    # compilation, not host speed — discard it
    probe()

    # warm every query's generated stages at sf0.001
    for name in (CONTROL,) + TARGETS:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass

    out = {"session": "local[16]@4g/640", "gate_sec": round(GATE, 3),
           "rows": {}}
    # control FIRST: a degraded window fails fast before burning 20
    # minutes on rows that would be discarded anyway
    for name in (CONTROL,) + TARGETS:
        pre = probe()
        best = float("inf")
        for _ in range(a.repeats):
            t0 = time.time()
            qs[name](spark, SF_10).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.time() - t0)
        post = probe()
        out["rows"][name] = {
            "sf10_sec": round(best, 3),
            "probe_pre": pre,
            "probe_post": post,
            "dirty": pre > GATE or post > GATE,
        }
        print(f"{name:34s} {best:8.3f}s  pre={pre} post={post}",
              file=sys.stderr)
        if name == CONTROL:
            band_ok = best <= CONTROL_R8_WALL * a.control_band
            out["control_ok"] = band_ok
            if not band_ok:
                print(
                    f"CONTROL DIRTY: {best:.1f}s vs r8 "
                    f"{CONTROL_R8_WALL}s — window degraded, aborting",
                    file=sys.stderr,
                )
                print(json.dumps(out))
                spark.stop()
                return 1

    clean = out["control_ok"] and not any(
        r["dirty"] for r in out["rows"].values()
    )
    out["window_clean"] = clean
    if a.commit and clean:
        path = os.path.join(REPO, "SCALING.json")
        with open(path) as f:
            data = json.load(f)
        for name, r in out["rows"].items():
            if name == CONTROL:
                continue  # control is evidence, not a row update
            row = data["queries"].get(name)
            if row and "sf0.1_sec" in row:
                row["sf10_sec"] = r["sf10_sec"]
                row["ratio_100x"] = round(
                    r["sf10_sec"] / row["sf0.1_sec"], 2
                )
                row["probe_sf10"] = r["probe_pre"]
                row["probe_sf10_post"] = r["probe_post"]
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        out["committed"] = True
    print(json.dumps(out))
    spark.stop()
    return 0 if clean else 1


if __name__ == "__main__":
    raise SystemExit(main())
