#!/usr/bin/env python
"""Measure the composed end-to-end pipeline at scale (VERDICT r13 #5).

``dag_pipeline_clean_pack`` claims a specific scale shape: ONE corpus
shuffle keyed by the md5 content hash (the cleaned text rides that
exchange once), per-row gate, the inverted-index decontamination join,
and the two-phase prefix-sum pack — with Catalyst fusing all six DAG
nodes into one plan. Every STAGE has scale evidence individually; this
probe measures the FUSED plan itself on the replicated sf1.0/sf3.0/sf10
corpora (scripts/gen_scale.py):

- wall time per sf point, clean-flanked (codegen probe before/after,
  local[16] gate 0.85s — the SCALING.json probe_sf3/probe_sf10 gate);
- REAL shuffle-write bytes per point (Spark REST stage metrics), split
  into the clean→dedup PREFIX (the content-hash exchange — the "text
  rides once" claim: its shuffle bytes should track the cleaned-text
  volume ~1×) and the FULL pipeline (prefix + the shingle
  decontamination join + the pack exchange);
- the cleaned-text byte volume itself, so the ratio is explicit.

Usage: python scripts/probe_pipeline_scaling.py [--commit] [--sf10]
Prints one JSON line; --commit merges a `pipeline_clean_pack` block
into SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_GATE = 0.85  # local[16] clean-epoch codegen gate (SCALING.json)


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.load(r)


def _stage_shuffle_bytes(spark, after_stage: int) -> tuple[int, int]:
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"applications/{app}/stages?status=complete")
    tot, max_id = 0, after_stage
    for st in stages:
        sid = st["stageId"]
        if sid > after_stage:
            tot += st.get("shuffleWriteBytes", 0)
            max_id = max(max_id, sid)
    return tot, max_id


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    ap.add_argument("--sf10", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "true")
        .appName("pipeline-clean-pack-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    from mldag_spark.functions import normalize_text

    qs = entrymod.queries()

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003)"
        ).collect()
        return round(time.time() - t0, 3)

    def dedup_prefix(sf_dir):
        # the pipeline's FIRST (and only corpus-text) exchange,
        # expressed with the identical stage expressions — measured
        # separately so the "text rides once" claim has its own bytes
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        cleaned = docs.select(
            "doc_id", normalize_text(F.col("text")).alias("clean")
        )
        w = Window.partitionBy(F.md5(F.col("clean"))).orderBy("doc_id")
        return (
            cleaned.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )

    sfs = {
        "sf1.0": os.path.join(REPO, ".testdata/sf1.0"),
        "sf3.0": os.path.join(REPO, ".testdata/sf3.0"),
    }
    if args.sf10:
        sfs["sf10"] = os.path.join(REPO, ".testdata/sf10")

    # JIT warm-up + one tiny run to compile every generated stage
    probe()
    qs["dag_pipeline_clean_pack"](
        spark, "/root/testdata/sf0.001"
    ).write.mode("overwrite").format("noop").save()

    out = {
        "session": "local[16]@6g/64",
        "probe_gate": PROBE_GATE,
        "points": {},
    }
    last_stage = -1
    for sf, d in sfs.items():
        point = {"pre_probe": probe()}
        # cleaned-text volume: the denominator of the rides-once ratio
        clean_bytes = (
            spark.read.parquet(os.path.join(d, "documents.parquet"))
            .select(
                F.sum(
                    F.octet_length(normalize_text(F.col("text")))
                ).alias("b")
            )
            .first()["b"]
        )
        _, last_stage = _stage_shuffle_bytes(spark, last_stage)

        t0 = time.time()
        dedup_prefix(d).write.mode("overwrite").format("noop").save()
        point["prefix_wall_sec"] = round(time.time() - t0, 3)
        sh, last_stage = _stage_shuffle_bytes(spark, last_stage)
        point["prefix_shuffle_bytes"] = sh
        point["clean_text_bytes"] = int(clean_bytes)
        point["prefix_shuffle_per_text"] = round(sh / clean_bytes, 3)

        t0 = time.time()
        qs["dag_pipeline_clean_pack"](spark, d).write.mode(
            "overwrite"
        ).format("noop").save()
        point["full_wall_sec"] = round(time.time() - t0, 3)
        sh, last_stage = _stage_shuffle_bytes(spark, last_stage)
        point["full_shuffle_bytes"] = sh
        point["full_shuffle_per_text"] = round(sh / clean_bytes, 3)
        point["post_probe"] = probe()
        point["clean_flanks"] = (
            point["pre_probe"] <= PROBE_GATE
            and point["post_probe"] <= PROBE_GATE
        )
        out["points"][sf] = point
        print(json.dumps({sf: point}), file=sys.stderr)

    p1, p3 = out["points"].get("sf1.0"), out["points"].get("sf3.0")
    if p1 and p3:
        out["wall_ratio_sf3_over_sf1"] = round(
            p3["full_wall_sec"] / p1["full_wall_sec"], 2
        )
        out["shuffle_ratio_sf3_over_sf1"] = round(
            p3["full_shuffle_bytes"] / p1["full_shuffle_bytes"], 2
        )
    if args.sf10 and "sf10" in out["points"] and p1:
        p10 = out["points"]["sf10"]
        out["wall_ratio_sf10_over_sf1"] = round(
            p10["full_wall_sec"] / p1["full_wall_sec"], 2
        )
        out["shuffle_ratio_sf10_over_sf1"] = round(
            p10["full_shuffle_bytes"] / p1["full_shuffle_bytes"], 2
        )

    print(json.dumps(out))
    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        data = json.load(open(path))
        data["pipeline_clean_pack"] = out
        json.dump(data, open(path, "w"), indent=1)
        print("committed pipeline_clean_pack to SCALING.json",
              file=sys.stderr)


if __name__ == "__main__":
    main()
