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

    from pyspark.sql import functions as F

    from mldag_spark.functions import shingle_rows
    from mldag_spark.operators.bloom import bloom_sized_m_bits
    from mldag_spark.queries.streaming import pipeline_clean_stream_frame
    from mldag_spark.queries.text import (
        _split_bucket,
        pipeline_clean_stage,
        pipeline_dedup_stage,
        pipeline_gate_exprs,
    )

    def sized_m_bits(d):
        # production sizing: measure the test split's distinct
        # complete 5-gram count (one bounded aggregate) and size the
        # bitmap at 16 bits/element
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        _n, _dr, keep = pipeline_gate_exprs()
        scored = pipeline_dedup_stage(pipeline_clean_stage(docs)).filter(
            keep
        )
        test = scored.withColumn("bucket", _split_bucket()).filter(
            F.col("bucket") >= 90
        )
        n_sh = (
            shingle_rows(test, "doc_id", "clean", 5, complete_only=True)
            .select("shingle").distinct().count()
        )
        return n_sh, bloom_sized_m_bits(n_sh)

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
            if name == "stream_pipeline_clean":
                # the gate query's fixed 2^20 bitmap saturates at
                # scale (sf10: 0 survivors) — measure the
                # production-SIZED variant alongside it
                n_sh, m = sized_m_bits(d)
                point["test_shingles_distinct"] = n_sh
                point["sized_m_bits"] = m
                t0 = time.time()
                sdf = pipeline_clean_stream_frame(spark, d, m_bits=m)
                point["sized_n_rows"] = sdf.count()
                point["sized_wall_sec"] = round(time.time() - t0, 3)
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
