#!/usr/bin/env python
"""Measure the local BPE trainer at production merge counts
(VERDICT r12 #1).

r12 closed the merge-AXIS flag: the distributed loop's per-merge cost
is flat (~0.94 s/merge to 1,024 merges — SCALING.json
``bpe_merge_axis``). But that invariant is Spark JOB LATENCY, so a
production vocabulary (~32k merges) still costs ~8 h of pure
scheduler overhead — for a ``top_words``-capped vocab that is
closure-sized by contract. ``trainer="local"`` (r13,
operators/tokenizer.py) collects the capped vocabulary once and runs
the merge loop driver-side with incremental pair statistics.

This probe, on the SAME word-4gram corpus the r12 probe used
(sf0.1 documents, top_words=50,000 — 50k units / ~1.05M symbols):

1. pins bit-identity vs the distributed path at n_merges=64 (the
   probe-scale replay of the pytest pin);
2. measures the local trainer at 1,024 / 10,240 / 32,768 merges —
   wall time INCLUDING the distributed vocab aggregate + bounded
   collect;
3. compares against the measured distributed floor (0.9421 s/merge,
   SCALING bpe_merge_axis batched 1024): projected distributed wall
   vs actual local wall at each point.

Usage: python scripts/probe_bpe_local_trainer.py [--commit]
Prints one JSON line; --commit merges a `bpe_local_trainer` block
into SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TOP_WORDS = 50_000
POINTS = [1024, 10_240, 32_768]
DIST_PER_MERGE_SEC = 0.9421  # SCALING.json bpe_merge_axis batched@1024


def gram_corpus(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return docs.select(
        F.split(F.lower("text"), " ").alias("ws")
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws)-3, 0)),"
                " i -> concat_ws('~', slice(ws, i, 4)))"
            )
        ).alias("text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .appName("bpe-local-trainer")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.operators.tokenizer import bpe_learn

    grams = gram_corpus(spark).persist()
    grams.count()

    # 1. probe-scale bit-identity pin at 64 merges
    m_dist, enc_dist = bpe_learn(
        grams, "text", n_merges=64, top_words=TOP_WORDS,
        trainer="distributed",
    )
    m_loc, enc_loc = bpe_learn(
        grams, "text", n_merges=64, top_words=TOP_WORDS, trainer="local"
    )
    ident_merges = m_loc == m_dist
    ident_enc = sorted(
        (r["s"], r["cnt"]) for r in enc_loc.collect()
    ) == sorted((r["s"], r["cnt"]) for r in enc_dist.collect())
    print(
        f"bit-identity@64: merges={ident_merges} enc={ident_enc}",
        file=sys.stderr,
    )

    out = {
        "sf_dir": SF_DIR,
        "unit": "word-4gram",
        "top_words": TOP_WORDS,
        "bit_identical_to_distributed_at_64": bool(
            ident_merges and ident_enc
        ),
        "dist_per_merge_sec_ref": DIST_PER_MERGE_SEC,
        "local": {},
    }

    # 2. local trainer at production merge counts (wall includes the
    # distributed vocab aggregate + the bounded collect)
    for n in POINTS:
        t = time.time()
        merges, _enc = bpe_learn(
            grams, "text", n_merges=n, top_words=TOP_WORDS,
            trainer="local",
        )
        w = round(time.time() - t, 3)
        done = len(merges)
        proj = round(done * DIST_PER_MERGE_SEC, 1)
        out["local"][str(n)] = {
            "wall_sec": w,
            "merges_done": done,
            "per_merge_ms": round(1000.0 * w / max(done, 1), 3),
            "projected_distributed_sec": proj,
            "speedup_vs_distributed": round(proj / w, 1),
        }
        print(
            f"local n={n}: {w}s ({done} merges; distributed would be "
            f"~{proj / 3600:.2f} h)",
            file=sys.stderr,
        )

    print(json.dumps({"bpe_local_trainer": out}))

    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        with open(path) as f:
            scaling = json.load(f)
        scaling["bpe_local_trainer"] = out
        with open(path, "w") as f:
            json.dump(scaling, f, indent=1)
            f.write("\n")
        print("committed to SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
