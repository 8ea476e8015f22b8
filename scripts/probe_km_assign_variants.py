#!/usr/bin/env python
"""r16 probe: can the exact-decimal Lloyd assignment go faster?

Three questions, answered against the shipped `_km_assign` on the
sf0.1 embeddings (2000 rows, k=8, d=64):

1. Where does the ~0.85 s/iteration go? Split construct/parse vs
   analyze vs execute, and scale the row count 16x.
2. Does materializing the argmin struct ONCE (two-step projection,
   CollapseProject's non-cheap guard keeps it un-merged) beat the
   shipped form that inlines the array_min tree twice?
3. Does exact scaled-integer (long) arithmetic — components and
   centroids at 1e6, squared distances at 1e12 — reproduce the
   kernel's values?

Findings (committed output plans/r16/probe_km_assign_variants.json):

- execute dominates (parse 0.13 s, analyze 0.02 s, execute 0.83 s)
  and scales linearly with rows — per-row interpreted HOF decimal
  work (~8.5 ms/row/core), not codegen compile (same-literals rerun
  and wholeStage=false both measure the same).
- single-copy projection: plan shows 16 -> 8 aggregate(zip_with(
  trees but execution is flat (0.85 -> 0.79 s) — whole-stage codegen
  subexpression elimination already dedupes the twin argmin. NEGATIVE.
- scaled-long arithmetic is 2.5x faster (0.75 -> 0.30 s) but computes
  the TRUE exact square of the 6-dp differences, while the kernel's
  contract (and its DuckDB oracle, which replays it verbatim) is
  "per-element square in DOUBLE, cast to DECIMAL(20,12), exact
  decimal sum" — values differ at the 12th decimal (e.g.
  1.718295241387 vs 1.718295241400). REJECTED: the declared results
  would change. The family's floor is contract-bound.
"""

from __future__ import annotations

import copy
import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from mldag_spark.session import recommended_session_confs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config(map=recommended_session_confs())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mldag_spark.queries.vectors import _km_quantized, _km_assign, _km_dist

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    vec = _km_quantized(spark, sf)
    work = vec.persist()
    n_rows = work.count()
    cents = [list(r["v"]) for r in vec.orderBy("vec_id").limit(8).collect()]
    out: dict = {"sf_dir": sf, "rows": n_rows}

    def assign_single_copy(df, cs):
        structs = ", ".join(
            f"struct({_km_dist(c)} AS d, {j} AS c)" for j, c in enumerate(cs)
        )
        amin = f"array_min(array({', '.join([structs])}))"
        return df.selectExpr("vec_id", "v", f"{amin} AS _m").selectExpr(
            "vec_id", "v", "_m.c AS cid", "_m.d AS d"
        )

    def assign_long(df, cs):
        structs = []
        for j, c in enumerate(cs):
            lits = ", ".join(
                str(int(round(x * 1_000_000))) + "L" for x in c
            )
            d = (
                f"aggregate(zip_with(_vs, array({lits}), "
                "(x, c) -> (x - c) * (x - c)), 0L, (acc, t) -> acc + t)"
            )
            structs.append(f"struct({d} AS d, {j} AS c)")
        amin = f"array_min(array({', '.join(structs)}))"
        return (
            df.selectExpr(
                "vec_id",
                "v",
                "transform(v, x -> CAST(round(x * 1000000) AS BIGINT))"
                " AS _vs",
            )
            .selectExpr("vec_id", "v", f"{amin} AS _m")
            .selectExpr(
                "vec_id",
                "v",
                "_m.c AS cid",
                "CAST(CAST(_m.d AS DECIMAL(26,0)) * "
                "CAST(0.000000000001 AS DECIMAL(13,12)) AS DECIMAL(24,12))"
                " AS d",
            )
        )

    def timed(mk, reps=3):
        best = 9e9
        rows = None
        for i in range(reps):
            c2 = copy.deepcopy(cents)
            c2[0][0] = round(c2[0][0] + 1e-6 * (i + 1), 6)
            df = mk(work, c2).groupBy("cid").agg(
                F.count(F.lit(1)).alias("n"), F.sum("d").alias("sd")
            )
            t0 = time.time()
            rows = sorted(map(tuple, df.collect()))
            best = min(best, time.time() - t0)
        return round(best, 3), rows

    # warm once
    timed(_km_assign, reps=1)
    t_a, r_a = timed(_km_assign)
    t_b, r_b = timed(assign_single_copy)
    t_l, r_l = timed(assign_long)
    out["shipped_two_copy_sec"] = t_a
    out["single_copy_sec"] = t_b
    out["single_copy_values_match"] = r_a == r_b
    out["scaled_long_sec"] = t_l
    out["scaled_long_agg_match"] = r_a == r_l

    # per-row bit identity of the long variant (expected: FALSE — the
    # contract is double squares cast to 12 dp, not true exact squares)
    c2 = copy.deepcopy(cents)
    c2[0][0] = round(c2[0][0] + 1e-6, 6)
    ra = sorted(
        map(tuple, _km_assign(work, c2).select("vec_id", "cid", "d").collect())
    )
    rl = sorted(
        map(tuple, assign_long(work, c2).select("vec_id", "cid", "d").collect())
    )
    out["scaled_long_rows_identical"] = ra == rl
    out["scaled_long_first_diffs"] = [
        [list(map(str, x)), list(map(str, y))]
        for x, y in zip(ra, rl)
        if x != y
    ][:3]

    # plan-shape fact for the single-copy variant
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assign_single_copy(work, cents).explain("formatted")
    out["single_copy_plan_agg_trees"] = buf.getvalue().count(
        "aggregate(zip_with"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _km_assign(work, cents).explain("formatted")
    out["shipped_plan_agg_trees"] = buf.getvalue().count("aggregate(zip_with")

    work.unpersist()
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
