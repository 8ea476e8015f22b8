#!/usr/bin/env python
"""Rebuild SCALING.json's prose blocks (diagnoses, notes, sessions)
from the CURRENT bench_scaling literals without re-measuring anything.

Use after editing a diagnosis in scripts/bench_scaling.py: the
measured rows stay untouched, the ratio prefixes are re-stamped from
those rows, and any top-level block the harness does not produce
(layout_sf1.0 etc.) is preserved — same merge discipline as the
harness itself (VERDICT r6 #3).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_scaling as B  # noqa: E402


def main() -> int:
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        data = json.load(f)
    rows = data.get("queries", {})

    data["quadratic_output_ops"] = dict(B.QUADRATIC_OUTPUT_OPS)
    data["sf3.0_session"] = B.SF3_SESSION
    data["sf10_session"] = B.SF10_SESSION
    data["notes"] = {k: v for k, v in B.NOTES.items() if k in rows}
    data["sf3.0_diagnoses"] = {
        k: f"{rows[k]['ratio_30x']}x at 30x data: {v}"
        for k, v in B.SF3_DIAGNOSES_RAW.items()
        if "sf3.0_sec" in rows.get(k, {})
    }
    data["sf10_diagnoses"] = {
        k: f"{rows[k]['ratio_100x']}x at 100x data: {v}"
        for k, v in B.SF10_DIAGNOSES_RAW.items()
        if "sf10_sec" in rows.get(k, {})
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(
        f"restamped: {len(data['sf3.0_diagnoses'])} sf3.0 + "
        f"{len(data['sf10_diagnoses'])} sf10 diagnoses"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
