"""Probe (VERDICT r7 #5): attribute dedup_ngram_jaccard's sf10 ratio
(22.3, the highest 100x row) by splitting candidate generation from
verification, and measure whether the PPJoin positional filter
(operators/dedup.py, r8) pays for itself at scale.

For each variant (positional on/off) and stage:
  cand  — count() of the candidate pairs (prefix build + self-join +
          pair aggregate), i.e. everything BEFORE verification
  full  — count() of the verified pair output
Verification time ~ full - cand (same warm candidate subtree rides
both). Candidate and verified pair counts are printed so the filter's
selectivity is visible, not just its wall effect.

Run:  python scripts/probe_ppjoin_positional.py --sf .testdata/sf3.0
      python scripts/probe_ppjoin_positional.py --sf .testdata/sf10 --cores 16 --heap 4g --shuffle 640
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
    ap.add_argument("--sf", default=os.path.join(REPO, ".testdata", "sf3.0"))
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--heap", default="4g")
    ap.add_argument("--shuffle", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from scripts.bench_scaling import _make_spark

    spark = _make_spark(args.heap, cores=args.cores, shuffle=args.shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F  # noqa: F401

    from mldag_spark.functions import shingle_rows
    from mldag_spark.operators.dedup import (
        _verify_pairs_by_rows,
        jaccard_prefix_pairs,
    )
    from mldag_spark.queries.tables import load

    d = load(spark, args.sf, "documents")
    rows = shingle_rows(d, "doc_id", "text", 3)

    out = {"sf": args.sf, "cores": args.cores, "variants": {}}
    for label, positional in (("positional", True), ("distinct", False)):
        # candidate stage only: rebuild through the operator but stop
        # before verification by reaching into the returned plan's
        # candidate subtree — cleanest is to re-run the operator's
        # public API for `full` and a candidates-only replica for
        # `cand` via the same entry point with a stubbed verifier.
        import mldag_spark.operators.dedup as dd

        captured = {}
        real_verify = dd._verify_pairs_by_rows

        def capture(cands, rws, *a, **k):
            captured["cands"] = cands
            return real_verify(cands, rws, *a, **k)

        dd._verify_pairs_by_rows = capture
        try:
            full_df = jaccard_prefix_pairs(
                rows, "doc_id", "shingle", 0.8, positional=positional
            )
        finally:
            dd._verify_pairs_by_rows = real_verify
        cand_df = captured["cands"]

        rec = {"cand_sec": [], "full_sec": []}
        for _ in range(args.repeats):
            t0 = time.monotonic()
            rec["n_candidates"] = cand_df.count()
            rec["cand_sec"].append(round(time.monotonic() - t0, 2))
            t0 = time.monotonic()
            rec["n_pairs"] = full_df.count()
            rec["full_sec"].append(round(time.monotonic() - t0, 2))
        rec["cand_min"] = min(rec["cand_sec"])
        rec["full_min"] = min(rec["full_sec"])
        rec["verify_approx_sec"] = round(rec["full_min"] - rec["cand_min"], 2)
        out["variants"][label] = rec

    p, q = out["variants"]["positional"], out["variants"]["distinct"]
    out["candidate_reduction"] = (
        round(q["n_candidates"] / p["n_candidates"], 3)
        if p["n_candidates"]
        else None
    )
    out["speedup_full"] = (
        round(q["full_min"] / p["full_min"], 3) if p["full_min"] else None
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
