#!/usr/bin/env python
"""Semi-join vocab prefilter probe for text_bigram_surprisal (r16,
VERDICT r15 #8).

The query's remaining ~1.0-1.4 s at sf0.1 is the occurrence-scale
probe join-back (grams ⋈ score on bg) plus the vocabulary aggregates.
VERDICT r15 asked to probe a SEMI-JOIN PREFILTER of the vocab side
before accepting that floor. Structurally the filter has zero
selectivity — `score` is built FROM `grams` (bf = grams.groupBy(bg)),
so every vocab row has at least one occurrence and nothing can be
pruned — which predicts the variant can only add work (an extra
occurrence-scale distinct). This probe measures it anyway, interleaved
ABBA in one session, plus the executed-plan join strategies (at sf0.1
AQE already BROADCASTS the score side: 2 BroadcastHashJoin, 0
SortMergeJoin — the occurrence rows never shuffle onto bg at all).

Usage: python scripts/probe_bigram_vocab_prefilter.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)
from mldag_spark.session import recommended_session_confs  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    reps = 4
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
        if a == "--reps":
            reps = int(sys.argv[i + 1])

    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bigram-vocab-prefilter-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.queries.tables import load

    def build(variant: str):
        d = load(spark, sf_dir, "documents")
        pretok = d.selectExpr(
            "doc_id",
            r"split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')"
            " AS toks",
        )
        m = "size(toks) - 1"
        grams = (
            pretok.selectExpr(
                "doc_id",
                f"explode(arrays_zip(slice(toks, 1, {m}),"
                f" slice(toks, 2, {m}))) AS _z",
            )
            .selectExpr("doc_id", "concat_ws(' ', _z.`0`, _z.`1`) AS bg")
            .localCheckpoint(eager=False)
        )
        bf = grams.groupBy("bg").agg(F.expr("count(1) AS cb"))
        w1 = "substring_index(bg, ' ', 1)"
        cf = bf.groupBy(F.expr(f"{w1} AS w1")).agg(F.expr("sum(cb) AS cw"))
        score = (
            bf.selectExpr("bg", "cb", f"{w1} AS w1")
            .join(cf, "w1")
            .selectExpr(
                "bg",
                "CAST(ROUND(-log2(CAST(cb AS DOUBLE) / cw), 6)"
                " AS DECIMAL(18,6)) AS _surp",
            )
        )
        if variant == "prefilter":
            score = score.join(
                grams.select("bg").distinct(), "bg", "semi"
            )
        return (
            grams.join(score, "bg")
            .groupBy("doc_id")
            .agg(
                F.expr("count(1) AS n_bigrams"),
                F.expr(
                    "ROUND(CAST(SUM(_surp) AS DOUBLE) / count(1), 4)"
                    " AS avg_surprisal"
                ),
            )
        )

    def run(variant: str) -> float:
        t0 = time.time()
        build(variant).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    print(json.dumps({"warmup": [run("base"), run("prefilter"),
                                 run("base")]}), flush=True)

    ratios = []
    for rep in range(reps):
        order = ["a", "b", "b", "a"] if rep % 2 == 0 else ["b", "a", "a", "b"]
        acc = {"a": 0.0, "b": 0.0}
        for s in order:
            acc[s] += run("base" if s == "a" else "prefilter")
        ratios.append(round(acc["b"] / acc["a"], 3))
        print(json.dumps({"rep": rep, "sums": acc,
                          "ratio": ratios[-1]}), flush=True)
    print(json.dumps({
        "sf_dir": sf_dir,
        "block_ratios": ratios,
        "ratio_median": round(statistics.median(ratios), 3),
    }, indent=1))

    # row equality of the two variants (the prefilter is a semi join,
    # so rows CANNOT differ; checked anyway at the probe SF)
    a_rows = {tuple(r) for r in build("base").collect()}
    b_rows = {tuple(r) for r in build("prefilter").collect()}
    print(json.dumps({"rows_equal": a_rows == b_rows, "n": len(a_rows)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
