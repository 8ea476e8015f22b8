#!/usr/bin/env python
"""Measure the substring-dedup hashed shuffle key at scale
(VERDICT r11 #6).

``substring_spans(hash_fingerprints=True)`` swaps the W-token window
STRING shuffle key for a (xxhash64 seed1, xxhash64 seed2) struct — 16
bytes instead of ~W·(avg token length+1) — with test-pinned
hashed == string results. The claim worth money at 100 TB is the
shuffle-byte reduction on the corpus-wide groupBy(win) +
join-back; this probe measures BOTH variants' wall time and REAL
shuffle write bytes (Spark REST /api/v1 stage metrics, local UI) on
the replicated sf3.0 corpus (and sf10 with --sf10).

Usage: python scripts/probe_substring_hashed_key.py [--commit] [--sf10]
Prints one JSON line; --commit merges a `substring_hashed_key` block
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

W = 20  # the registered query's window (queries/text.py _SUBSTR_W)


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.load(r)


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _stage_shuffle_bytes(spark, after_stage: int) -> tuple[int, int]:
    """(shuffle_write_bytes, max_seen_stage) over completed stages with
    stageId > after_stage."""
    stages = _rest(spark, f"applications/{_app_id(spark)}/stages?status=complete")
    tot = 0
    max_id = after_stage
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

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "true")
        .appName("substring-hashed-key")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.functions import tokenize
    from mldag_spark.operators.dedup import substring_spans

    sfs = {"sf3.0": os.path.join(REPO, ".testdata/sf3.0")}
    if args.sf10:
        sfs["sf10"] = os.path.join(REPO, ".testdata/sf10")

    out = {"window_tokens": W, "points": {}}
    last_stage = -1
    for sf, d in sfs.items():
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        pre = docs.select(
            "doc_id", tokenize(F.col("text")).alias("toks")
        )
        point = {}
        for label, hashed in (("string_key", False), ("hashed_key", True)):
            t = time.time()
            n = substring_spans(
                pre, "doc_id", "toks", window=W, hash_fingerprints=hashed
            ).count()
            wall = round(time.time() - t, 3)
            sh, last_stage = _stage_shuffle_bytes(spark, last_stage)
            point[label] = {
                "wall_sec": wall,
                "shuffle_write_bytes": sh,
                "spans": n,
            }
            print(f"{sf} {label}: {point[label]}", file=sys.stderr)
        point["shuffle_reduction"] = round(
            point["string_key"]["shuffle_write_bytes"]
            / max(point["hashed_key"]["shuffle_write_bytes"], 1),
            2,
        )
        point["rows_equal"] = (
            point["string_key"]["spans"] == point["hashed_key"]["spans"]
        )
        out["points"][sf] = point

    print(json.dumps(out))
    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        with open(path) as f:
            scal = json.load(f)
        scal["substring_hashed_key"] = out
        with open(path, "w") as f:
            json.dump(scal, f, indent=1)
        print("committed to SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
