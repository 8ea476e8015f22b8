#!/usr/bin/env python
"""Scale row for the r15 streaming pack (``stream_pack_batches``).

The number worth watching is the STREAMING OVERHEAD over the batch
packer: the stream pays per-micro-batch fixed costs — the checkpoint/
sink machinery, and (because foreachBatch frames are ExistingRDD-
backed) the packer's literal-offsets path, whose per-batch totals
collect serializes one extra evaluation of the batch. With K
micro-batches over the same corpus that is K quantile actions +
K totals collects + K shifted writes + K O(1) carry reads vs the
batch packer's single overlapped job — the overhead should be
~K × fixed cost and shrink RELATIVELY as batches grow (the 100 TB
regime: big batches, overhead amortized).

Measures, per sf: batch packer wall, streamed wall (4 id-range
micro-batches, the gate shape), row parity, and the per-batch
overhead decomposition. Clean-flanked per the standard protocol.
Usage: python scripts/probe_stream_pack_scaling.py [--commit] [--sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_GATE = 0.85


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--sf10", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .appName("stream-pack-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark import streaming as S
    from mldag_spark.functions import tokenize
    from mldag_spark.operators.packing import token_budget_batches

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

    out = {"session": "local[16]@6g/64", "probe_gate": PROBE_GATE,
           "n_micro_batches": 4, "points": {}}
    for sf, d in sfs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        counts = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
        )
        point = {"pre_probe": probe()}

        t0 = time.time()
        batch_rows = token_budget_batches(
            counts, "doc_id", "n_tokens", 4096
        ).count()
        point["batch_wall_sec"] = round(time.time() - t0, 3)
        point["n_rows"] = batch_rows

        work = tempfile.mkdtemp(prefix="probe_stream_pack_")
        try:
            src = f"{work}/src"
            t0 = time.time()
            S.stage_id_ordered_micro_batches(counts, src, 4, "doc_id")
            point["stage_wall_sec"] = round(time.time() - t0, 3)

            # SYMMETRIC batch baseline: the batch packer over the SAME
            # staged (doc_id, n_tokens) parquet the stream reads —
            # otherwise the overhead decomposition subtracts tokenize
            # work only the live-lineage baseline pays (code-review
            # r15 late #1)
            staged = spark.read.parquet(src)
            t0 = time.time()
            point["batch_staged_rows"] = token_budget_batches(
                staged, "doc_id", "n_tokens", 4096
            ).count()
            point["batch_staged_wall_sec"] = round(time.time() - t0, 3)

            t0 = time.time()
            S.pack_stream(
                spark.readStream.schema("doc_id bigint, n_tokens bigint")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                "doc_id",
                "n_tokens",
                max_tokens=4096,
                out_path=f"{work}/packed",
                checkpoint=f"{work}/ckpt",
                carry_path=f"{work}/carry",
            )
            point["stream_wall_sec"] = round(time.time() - t0, 3)
            point["stream_n_rows"] = (
                spark.read.parquet(f"{work}/packed").count()
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)

        point["rows_match"] = point["stream_n_rows"] == batch_rows
        # overhead vs the SAME staged input the stream reads
        point["overhead_per_batch_sec"] = round(
            (point["stream_wall_sec"] - point["batch_staged_wall_sec"])
            / 4,
            3,
        )
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
        data["stream_pack"] = out
        json.dump(data, open(path, "w"), indent=1)
        print("committed SCALING.json: stream_pack", file=sys.stderr)


if __name__ == "__main__":
    main()
