#!/usr/bin/env python
"""Scale rows for the two r14 pipeline debuts.

- ``dag_pipeline_fit_apply``: the train/test FIT pipeline — front half
  shares ``pipeline_clean_pack``'s measured shuffle row; this adds the
  fused wall including the Spark ML summarizer fit + map-only apply.
- ``stream_pipeline_clean``: the composed streaming twin — complete-
  mode stateful dedup + per-row gate/bloom inside one streaming query;
  the number worth watching at scale is the wall as state grows with
  the (deduped) corpus.

Clean-flanked per the standard protocol (codegen probe, local[16]
gate 0.85). Usage: python scripts/probe_r14_pipelines_scaling.py
[--commit] [--sf10]
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
        .appName("r14-pipelines-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

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

    targets = ("dag_pipeline_fit_apply", "stream_pipeline_clean")
    probe()  # JIT warm-up
    for name in targets:
        qs[name](spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()

    out = {
        name: {"session": "local[16]@6g/64", "probe_gate": PROBE_GATE,
               "points": {}}
        for name in targets
    }
    for sf, d in sfs.items():
        for name in targets:
            point = {"pre_probe": probe()}
            t0 = time.time()
            df = qs[name](spark, d)
            point["n_rows"] = df.count()
            point["wall_sec"] = round(time.time() - t0, 3)
            point["post_probe"] = probe()
            point["clean_flanks"] = (
                point["pre_probe"] <= PROBE_GATE
                and point["post_probe"] <= PROBE_GATE
            )
            out[name]["points"][sf] = point
            print(json.dumps({name: {sf: point}}), file=sys.stderr)

    print(json.dumps(out))
    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        data = json.load(open(path))
        data["fit_apply_pipeline"] = out["dag_pipeline_fit_apply"]
        data["stream_pipeline_clean"] = out["stream_pipeline_clean"]
        json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
