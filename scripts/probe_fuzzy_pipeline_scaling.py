#!/usr/bin/env python
"""Scale evidence for the composed fuzzy-dedup chain (r15, VERDICT
r14 #2): ``dedup_fuzzy_pipeline`` = MinHash-LSH mining →
edit-distance verification → keep-best selection.

Stage-marginal attribution, measured cold-first: the FULL composed
query is timed first (the committed number), then the miner prefix
alone, then miner+verify — so ``verify_marginal = prefix2 - prefix1``
and ``selection_marginal = full - prefix2`` are both conservative
(prefixes run warm). The claims worth checking: mining dominates
(the dedup-rate law — SCALING ``edit_verify`` measured the verify
marginal disappearing inside miner variance at sf10), verification
cost is bounded by CANDIDATE pairs (not corpus), and selection rides
the measured-size broadcast path without any corpus-sized shuffle.

Usage: python scripts/probe_fuzzy_pipeline_scaling.py [--commit] [--sf10]
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

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "6g")
        .appName("fuzzy-pipeline-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    from mldag_spark.operators.dedup import edit_similarity_pairs
    from mldag_spark.queries.tables import load
    from mldag_spark.queries.text import (
        _FUZZY_EDIT_THRESHOLD,
        dedup_minhash_lsh,
        normalize_text,
    )

    qs = entrymod.queries()

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr(
            "sum((id * id) % 1000003)"
        ).collect()
        return round(time.time() - t0, 3)

    def drop_persistent_rdds():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(True)

    sfs = {"sf3.0": os.path.join(REPO, ".testdata/sf3.0")}
    if args.sf10:
        sfs["sf10"] = os.path.join(REPO, ".testdata/sf10")

    probe()  # JIT warm-up at gate scale
    qs["dedup_fuzzy_pipeline"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    drop_persistent_rdds()

    out = {"session": "local[16]@6g/64", "probe_gate": PROBE_GATE,
           "edit_threshold": _FUZZY_EDIT_THRESHOLD, "points": {}}
    for sf, d in sfs.items():
        point = {"pre_probe": probe()}
        t0 = time.time()
        qs["dedup_fuzzy_pipeline"](spark, d).write.mode(
            "overwrite"
        ).format("noop").save()
        point["full_wall_sec"] = round(time.time() - t0, 3)
        drop_persistent_rdds()

        t0 = time.time()
        point["n_mined_pairs"] = dedup_minhash_lsh(spark, d).count()
        point["miner_wall_sec"] = round(time.time() - t0, 3)
        drop_persistent_rdds()

        t0 = time.time()
        pairs = dedup_minhash_lsh(spark, d)
        docs = load(spark, d, "documents")
        texts = docs.select(
            "doc_id", normalize_text(F.col("text")).alias("norm")
        )
        verified = edit_similarity_pairs(
            pairs, texts, id_col="doc_id", text_col="norm"
        ).filter(F.col("edit_sim") >= _FUZZY_EDIT_THRESHOLD)
        point["n_verified_pairs"] = verified.count()
        point["mine_verify_wall_sec"] = round(time.time() - t0, 3)
        drop_persistent_rdds()

        point["verify_marginal_sec"] = round(
            point["mine_verify_wall_sec"] - point["miner_wall_sec"], 3
        )
        point["selection_marginal_sec"] = round(
            point["full_wall_sec"] - point["mine_verify_wall_sec"], 3
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
        data["fuzzy_pipeline"] = out
        json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
