#!/usr/bin/env python
"""A/B probe (r15, read-only): single-scan variants of the two text
headline queries vs the shipped two-scan shapes.

Both ``text_boilerplate_chunks`` and ``text_bigram_surprisal`` reference
their exploded occurrence frame twice (frequency branch + probe branch),
so the scan + regex tokenize + explode executes twice per run. The
variant inserts a lazy ``localCheckpoint(eager=False)`` at the reuse
point — the repo idiom from edit_similarity_pairs / connected_components
— so the producer executes once inside the timed action and the second
consumer reads the materialized blocks.

Interleaved min-of-N in ONE session (host-burst hygiene), codegen probe
stamped per pass. Rows compared current-vs-variant before timing.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    repeats = int(sys.argv[sys.argv.index("--repeats") + 1]) if "--repeats" in sys.argv else 4
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else "/root/testdata/sf0.1"

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from mldag_spark.session import recommended_session_confs

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-text-single-scan")
        .config("spark.sql.shuffle.partitions", str(cpus))
        # engine-contract confs from the package's single definition
        # (r16, VERDICT r15 #2): AQE, bucketed-scan ordering, subset
        # co-partition reuse — identical to the bench/tests sessions
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from mldag_spark.functions import tokenize
    from mldag_spark.queries.tables import load
    from mldag_spark.queries.text import (
        _BP_MIN_DOCS,
        _BP_W,
        text_bigram_surprisal,
        text_boilerplate_chunks,
    )

    def boiler_ckpt(spark, sf_dir):
        d = load(spark, sf_dir, "documents")
        pretok = d.select("doc_id", tokenize(F.col("text")).alias("toks"))
        toks = F.col("toks")
        n_full = (F.size(toks) / _BP_W).cast("int")
        chunk_arr = F.when(
            n_full > 0,
            F.transform(
                F.sequence(F.lit(0), n_full - 1),
                lambda i: F.array_join(F.slice(toks, i * _BP_W + 1, _BP_W), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        chunks = (
            pretok.select(
                "doc_id",
                F.size(toks).cast("long").alias("n_tokens"),
                F.explode(chunk_arr).alias("chunk"),
            )
            .withColumn("ck", F.xxhash64("chunk"))
            .drop("chunk")
        ).localCheckpoint(eager=False)
        boiler = (
            chunks.groupBy("ck")
            .agg(F.count_distinct("doc_id").alias("ndocs"))
            .filter(F.col("ndocs") >= _BP_MIN_DOCS)
            .select("ck", F.lit(1).alias("is_b"))
        )
        return (
            chunks.join(boiler, "ck", "left")
            .groupBy("doc_id", "n_tokens")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.coalesce(F.sum("is_b"), F.lit(0)).cast("long").alias("boiler_chunks"),
            )
            .select(
                "doc_id",
                "n_tokens",
                "n_chunks",
                "boiler_chunks",
                (F.col("n_tokens") - _BP_W * F.col("boiler_chunks"))
                .cast("long")
                .alias("kept_tokens"),
            )
        )

    def bigram_ckpt(spark, sf_dir):
        d = load(spark, sf_dir, "documents")
        pretok = d.select("doc_id", tokenize(F.col("text")).alias("toks"))
        toks = F.col("toks")
        n = F.size(toks)
        m = n - 1
        grams = (
            pretok.select(
                "doc_id",
                F.explode(
                    F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m))
                ).alias("_z"),
            )
            .select(
                "doc_id",
                F.concat_ws(" ", F.col("_z.0"), F.col("_z.1")).alias("bg"),
            )
            .localCheckpoint(eager=False)
        )
        bf = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
        w1 = F.substring_index(F.col("bg"), " ", 1)
        cf = bf.groupBy(w1.alias("w1")).agg(F.sum("cb").alias("cw"))
        score = bf.withColumn("w1", w1).join(cf, "w1").select(
            "bg",
            F.round(-F.log2(F.col("cb").cast("double") / F.col("cw")), 6)
            .cast("decimal(18,6)")
            .alias("_surp"),
        )
        return (
            grams.join(score, "bg")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.round(
                    F.sum("_surp").cast("double") / F.count(F.lit(1)),
                    4,
                ).alias("avg_surprisal"),
            )
        )

    cases = [
        ("boiler_current", text_boilerplate_chunks),
        ("boiler_ckpt", boiler_ckpt),
        ("bigram_current", text_bigram_surprisal),
        ("bigram_ckpt", bigram_ckpt),
    ]

    # rows equality first (sf0.001 + the probe sf)
    for check_sf in ("/root/testdata/sf0.001", sf_dir):
        for base, var in (("boiler_current", "boiler_ckpt"), ("bigram_current", "bigram_ckpt")):
            fb = dict(cases)[base](spark, check_sf)
            fv = dict(cases)[var](spark, check_sf)
            nb = fb.count()
            d1 = fb.exceptAll(fv).count()
            d2 = fv.exceptAll(fb).count()
            print(f"EQ {base} vs {var} @ {check_sf}: rows={nb} exceptAll={d1}/{d2}", flush=True)
            assert d1 == 0 and d2 == 0, "variant changed results"

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr("sum((id * id) % 1000003)").collect()
        return round(time.time() - t0, 3)

    # warm every plan once
    for name, fn in cases:
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    walls: dict[str, list[float]] = {n: [] for n, _ in cases}
    probes = []
    for r in range(repeats):
        for name, fn in cases:
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls[name].append(round(time.time() - t0, 3))
        probes.append(probe())
        print(f"pass {r}: " + " ".join(f"{n}={walls[n][-1]}" for n, _ in cases) + f" probe={probes[-1]}", flush=True)

    print("\nRESULT (min over passes):")
    for n, _ in cases:
        print(f"  {n}: min={min(walls[n])} all={walls[n]}")
    print(f"  probes={probes}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
