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
- r10 (ADVICE r9): the control alone cannot catch a burst that starts
  AND ends inside one target's repeats, so every target with a known
  clean-epoch wall is ALSO band-checked against it (like the control),
  and a row whose repeats diverge beyond DIVERGE_FACTOR gets one extra
  repeat — a burst inflates one repeat, not all three, so the min
  recovers; if the row still exceeds its band it is flagged dirty and
  NOT committed.
- results merge into SCALING.json only if --commit is passed AND the
  control lands within --control-band (default 1.25x) of its r8 wall;
  committed rows get their sf10_dirty / sf10_stale_code marks DELETED
  (the marks exist precisely to be cleared by a clean restamp).

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
# Clean-epoch expected walls for the band check (r8 rows for the four
# r9-poisoned/stale queries; bm25's is its own clean r9 row). The
# jaccard/components walls predate the late-r8 zip-shingle rewrite,
# which measured neutral-to-faster at sf0.1/sf3.0, and near-dup's
# predates the r9 norm-precompute verify (40-52% faster at sf3.0) —
# so current code at these walls x band is a conservative upper bound.
EXPECTED_WALL = {
    "dedup_minhash_lsh": 54.7,
    "stream_incremental_dedup": 33.4,
    "dedup_ngram_jaccard": 132.3,
    "dedup_components": 141.9,
    "text_bm25_topk": 5.99,
    "embedding_near_dup_blocked": 28.0,
    # dedup_overlap_pairs: first sf10 point (df_cap=64 contract), no
    # prior wall — divergence rerun + probes are its only guards
}
TARGETS = (
    "dedup_minhash_lsh",
    "stream_incremental_dedup",
    "dedup_ngram_jaccard",
    "dedup_components",
    "text_bm25_topk",
    # r10: the norm-precompute verify's first clean sf10 point, and the
    # capped overlap join's first 100x datapoint (VERDICT r9 #1)
    "embedding_near_dup_blocked",
    "dedup_overlap_pairs",
)
SF_10 = os.path.join(REPO, ".testdata", "sf10")
ANCHOR_16C = 0.34 * 32 / 16
GATE = 1.25 * ANCHOR_16C
DIVERGE_FACTOR = 1.35


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--control-band", type=float, default=1.25)
    ap.add_argument("--target-band", type=float, default=1.4)
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
        walls = []
        for _ in range(a.repeats):
            t0 = time.time()
            qs[name](spark, SF_10).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(time.time() - t0)
        # ADVICE r9: a burst that starts and ends within one target's
        # repeats leaves clean probes but divergent repeats — take one
        # extra repeat so the min can recover from a single-burst hit
        if len(walls) >= 2 and max(walls) > DIVERGE_FACTOR * min(walls):
            t0 = time.time()
            qs[name](spark, SF_10).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(time.time() - t0)
        best = min(walls)
        post = probe()
        expected = EXPECTED_WALL.get(name)
        band_dirty = bool(
            expected and best > expected * a.target_band
        )
        out["rows"][name] = {
            "sf10_sec": round(best, 3),
            "walls": [round(w, 3) for w in walls],
            "probe_pre": pre,
            "probe_post": post,
            "expected_wall": expected,
            "dirty": pre > GATE or post > GATE or band_dirty,
        }
        print(
            f"{name:34s} {best:8.3f}s  walls={[round(w,1) for w in walls]}"
            f"  pre={pre} post={post}"
            + (f"  BAND-DIRTY (>{expected}x{a.target_band})"
               if band_dirty else ""),
            file=sys.stderr,
        )
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

    clean_rows = {
        name: r for name, r in out["rows"].items()
        if name != CONTROL and not r["dirty"]
    }
    out["window_clean"] = out["control_ok"] and not any(
        r["dirty"] for r in out["rows"].values()
    )
    if a.commit and out["control_ok"] and clean_rows:
        path = os.path.join(REPO, "SCALING.json")
        with open(path) as f:
            data = json.load(f)
        for name, r in clean_rows.items():
            row = data["queries"].get(name)
            if row and "sf0.1_sec" in row:
                row["sf10_sec"] = r["sf10_sec"]
                row["ratio_100x"] = round(
                    r["sf10_sec"] / row["sf0.1_sec"], 2
                )
                row["probe_sf10"] = r["probe_pre"]
                row["probe_sf10_post"] = r["probe_post"]
                # a clean restamp clears the poison/stale marks — that
                # is what the marks exist for
                for k in ("sf10_dirty", "sf10_dirty_reason",
                          "sf10_stale_code", "sf10_stale_reason"):
                    row.pop(k, None)
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        out["committed"] = sorted(clean_rows)
    print(json.dumps(out))
    spark.stop()
    return 0 if out["window_clean"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
