#!/usr/bin/env python
"""Measure BPE training cost along the MERGE axis (VERDICT r11 #1).

The corpus axis was always sound (one corpus-sized vocab aggregate);
the open flag was the merge axis: unbatched, merge i re-reads the
vocab through i nested ``replace`` expressions — O(n²) total vocab
work and an n-deep Catalyst expression tree at production merge
counts. The fix (``checkpoint_every``, operators/tokenizer.py)
materializes the encoded vocab every K merges, bounding plan depth at
K and making per-merge cost merge-count-invariant.

This probe measures BOTH paths on a production-shaped vocabulary
derived from the sf0.1 documents table. The raw table's synthetic
vocabulary is 31 distinct words (~107 possible merges — it fully
merges long before 1,000), so the training units are word 4-grams of
the same text ('~'-joined; a standard pre-tokenization choice —
merge-axis cost depends on vocab cardinality/symbol mass, not on
where the units came from), capped at top_words=50,000 exactly the
way production trainers cap: 50k units / ~1.05M symbols at sf0.1.

- batched (checkpoint_every=64): walls at n_merges = 64 / 256 / 1024;
  flat marginal per-merge cost across segments is the claim under
  test.
- unbatched (checkpoint_every=None): walls at 64 / 128 / 256; the
  growing marginal shows what the fix removes.

Usage: python scripts/probe_bpe_merge_axis.py [--commit]
Prints one JSON line; --commit merges a `bpe_merge_axis` block into
SCALING.json.
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
K = 64

BATCHED_POINTS = [64, 256, 1024]
UNBATCHED_POINTS = [64, 128, 256]


def gram_corpus(spark):
    """One row per word 4-gram of the sf0.1 documents text — the
    production-shaped training units (see module docstring)."""
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
        .appName("bpe-merge-axis")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.operators.tokenizer import bpe_learn, word_vocab

    grams = gram_corpus(spark).persist()
    n_units = grams.count()
    vocab_rows = word_vocab(grams, "text", top_words=TOP_WORDS).count()

    out = {
        "sf_dir": SF_DIR,
        "unit": "word-4gram",
        "gram_rows": n_units,
        "vocab_rows_capped": vocab_rows,
        "top_words": TOP_WORDS,
        "checkpoint_every": K,
        "batched": {},
        "unbatched": {},
    }

    for n in BATCHED_POINTS:
        t = time.time()
        merges, _enc = bpe_learn(
            grams, "text", n_merges=n, top_words=TOP_WORDS,
            checkpoint_every=K, trainer="distributed",
        )
        w = round(time.time() - t, 3)
        out["batched"][str(n)] = {
            "wall_sec": w,
            "merges_done": len(merges),
            "per_merge_sec": round(w / max(len(merges), 1), 4),
        }
        print(f"batched n={n}: {w}s ({len(merges)} merges)", file=sys.stderr)

    for n in UNBATCHED_POINTS:
        t = time.time()
        merges, _enc = bpe_learn(
            grams, "text", n_merges=n, top_words=TOP_WORDS,
            checkpoint_every=None, trainer="distributed",
        )
        w = round(time.time() - t, 3)
        out["unbatched"][str(n)] = {
            "wall_sec": w,
            "merges_done": len(merges),
            "per_merge_sec": round(w / max(len(merges), 1), 4),
        }
        print(f"unbatched n={n}: {w}s ({len(merges)} merges)", file=sys.stderr)

    # marginal per-merge cost between measurement points: flat for
    # batched (the claim), growing for unbatched (the removed defect)
    def marginals(d, pts):
        m = {}
        prev_n, prev_w = 0, 0.0
        for n in pts:
            w = d[str(n)]["wall_sec"]
            m[f"{prev_n}..{n}"] = round((w - prev_w) / (n - prev_n), 4)
            prev_n, prev_w = n, w
        return m

    out["batched_marginal_per_merge"] = marginals(out["batched"], BATCHED_POINTS)
    out["unbatched_marginal_per_merge"] = marginals(
        out["unbatched"], UNBATCHED_POINTS
    )

    grams.unpersist()
    print(json.dumps(out))

    if args.commit:
        path = os.path.join(REPO, "SCALING.json")
        with open(path) as f:
            scal = json.load(f)
        scal["bpe_merge_axis"] = out
        with open(path, "w") as f:
            json.dump(scal, f, indent=1)
        print("committed to SCALING.json", file=sys.stderr)


if __name__ == "__main__":
    main()
