#!/usr/bin/env python
"""A/B probe (r15, read-only): per-pair cosine_similarity (3 HOF folds
per pair) vs norm-precompute + dot (1 fold per pair) in
brute_force_topk, interleaved min-of-N in ONE session with a codegen
probe stamped per pass. Row equality checked first (bit-identical is
the claim: same folds over the same doubles, same division order).
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
    from pyspark.sql.window import Window

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-cosine-norm")
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

    from mldag_spark.functions import cosine_similarity, dot, l2_norm
    from mldag_spark.queries.tables import load

    def build(sf, precompute: bool):
        emb = load(spark, sf, "embeddings")
        qsrc = emb.filter(F.col("vec_id") < 10)
        q = qsrc.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        if precompute:
            q = q.withColumn("_qn", l2_norm(F.col("qv")))
            c = c.withColumn("_cn", l2_norm(F.col("cv")))
            cos = dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))
        else:
            cos = cosine_similarity(F.col("qv"), F.col("cv"))
        sims = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos"))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        return (
            sims.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("query_id", "neighbor_id", "cos", "rk")
        )

    for check_sf in ("/root/testdata/sf0.001", sf_dir):
        a = sorted(map(tuple, build(check_sf, False).collect()))
        b = sorted(map(tuple, build(check_sf, True).collect()))
        print(f"EQ @ {check_sf}: rows={len(a)} equal={a == b}", flush=True)
        assert a == b, "norm precompute changed results"

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr("sum((id * id) % 1000003)").collect()
        return round(time.time() - t0, 3)

    cases = [("per_pair", False), ("precomputed", True)]
    for _, pre in cases:
        build(sf_dir, pre).write.mode("overwrite").format("noop").save()

    walls = {n: [] for n, _ in cases}
    probes = []
    for r in range(repeats):
        for name, pre in cases:
            t0 = time.time()
            build(sf_dir, pre).write.mode("overwrite").format("noop").save()
            walls[name].append(round(time.time() - t0, 3))
        probes.append(probe())
        print(
            f"pass {r}: " + " ".join(f"{n}={walls[n][-1]}" for n, _ in cases)
            + f" probe={probes[-1]}",
            flush=True,
        )

    print("\nRESULT (min over passes):")
    for n, _ in cases:
        print(f"  {n}: min={min(walls[n])} all={walls[n]}")
    print(f"  probes={probes}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
