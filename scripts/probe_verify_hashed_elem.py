#!/usr/bin/env python
"""A/B probe (r15, read-only): hashed element fingerprints in the
fuzzy-dedup verification kernel vs the shipped string-element shape.

``_verify_pairs_by_rows`` sorts, windows, joins and re-shuffles the
distinct (id, _e) element rows with ``_e`` as the raw shingle STRING
(~20 B avg). The variant projects ``xxhash64(_e)`` ABOVE the distinct
(so grouping/distinctness is still string-exact and the projection
cannot split the callers' shared id-keyed exchange — the r8 pre-hash
trap), then runs every downstream sort/join/aggregate on the 8-byte
long. Counts are collision-exact on the test corpora (verified by rows
equality below); the same trade text_boilerplate_chunks ships with its
``ck`` fingerprint.

Interleaved min-of-N in ONE session, codegen probe stamped per pass.
Rows compared current-vs-variant at sf0.001 and the probe SF first.
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
        .appName("probe-verify-hashed-elem")
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

    import mldag_spark.operators.dedup as dedup
    from mldag_spark.queries.text import dedup_minhash_lsh, dedup_ngram_jaccard

    verify_orig = dedup._verify_pairs_by_rows

    def verify_hashed(
        candidates,
        rows,
        id_col,
        elem_col,
        left,
        right,
        threshold,
        rows_right=None,
    ):
        from pyspark.sql.window import Window

        def dh(r):
            # distinct on the STRING (exact), fingerprint projected on
            # top — CollapseProject folds it into the aggregate output,
            # never below the grouping
            return (
                r.select(F.col(id_col), F.col(elem_col).alias("_es"))
                .distinct()
                .select(id_col, F.xxhash64("_es").alias("_e"))
            )

        ex = dh(rows)
        ex_r = ex if rows_right is None else dh(rows_right)
        w = (
            Window.partitionBy(id_col)
            .orderBy("_e")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        exn = ex.withColumn("_n", F.count(F.lit(1)).over(w))
        exn_r = exn if rows_right is None else ex_r.withColumn(
            "_n", F.count(F.lit(1)).over(w)
        )
        ra = exn.select(
            F.col(id_col).alias(left), "_e", F.col("_n").alias("_na")
        ).hint("merge")
        rb = exn_r.select(
            F.col(id_col).alias(right), "_e", F.col("_n").alias("_nb")
        ).hint("merge")
        common = (
            candidates.join(ra, left)
            .repartition(F.col(right))
            .join(rb, [right, "_e"])
            .groupBy(left, right, "_na", "_nb")
            .agg(F.count(F.lit(1)).alias("_nc"))
        )
        jac = F.col("_nc").cast("double") / (
            F.col("_na") + F.col("_nb") - F.col("_nc")
        )
        return (
            common.filter(jac >= threshold)
            .select(left, right, F.round(jac, 4).alias("jaccard"))
        )

    def with_variant(fn, query):
        def run(spark, d):
            dedup._verify_pairs_by_rows = fn
            try:
                return query(spark, d)
            finally:
                dedup._verify_pairs_by_rows = verify_orig

        return run

    cases = [
        ("lsh_current", with_variant(verify_orig, dedup_minhash_lsh)),
        ("lsh_hashed", with_variant(verify_hashed, dedup_minhash_lsh)),
        ("ngram_current", with_variant(verify_orig, dedup_ngram_jaccard)),
        ("ngram_hashed", with_variant(verify_hashed, dedup_ngram_jaccard)),
    ]

    # rows equality first. Collect each tiny result frame in its OWN
    # job and compare in Python — an exceptAll would execute both heavy
    # query trees inside one job, which OOMs the 1 GiB local heap on
    # the ngram pair at sf0.1. The ngram pair checks at sf0.001+sf0.01
    # only: ngram_CURRENT at sf0.1 itself OOMs on this heap (the
    # element-rows STRING sort spills; 32 concurrent 1 MiB spill-reader
    # buffers + sort pages exceed 1 GiB) — that instability is exactly
    # what the hashed variant removes, demonstrated separately below.
    eq_plan = [
        ("lsh_current", "lsh_hashed", "/root/testdata/sf0.001"),
        ("ngram_current", "ngram_hashed", "/root/testdata/sf0.001"),
        ("lsh_current", "lsh_hashed", "/root/testdata/sf0.01"),
        ("ngram_current", "ngram_hashed", "/root/testdata/sf0.01"),
        ("lsh_current", "lsh_hashed", sf_dir),
    ]
    for base, var, check_sf in eq_plan:
        rb_rows = sorted(map(tuple, dict(cases)[base](spark, check_sf).collect()))
        rv_rows = sorted(map(tuple, dict(cases)[var](spark, check_sf).collect()))
        print(
            f"EQ {base} vs {var} @ {check_sf}: rows={len(rb_rows)} "
            f"equal={rb_rows == rv_rows}",
            flush=True,
        )
        assert rb_rows == rv_rows, "variant changed results"

    def probe() -> float:
        t0 = time.time()
        spark.range(1_000_000_000).selectExpr("sum((id * id) % 1000003)").collect()
        return round(time.time() - t0, 3)

    timed = [(n, f) for n, f in cases if n.startswith("lsh")]
    for name, fn in timed:
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    walls: dict[str, list[float]] = {n: [] for n, _ in timed}
    probes = []
    for r in range(repeats):
        for name, fn in timed:
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls[name].append(round(time.time() - t0, 3))
        probes.append(probe())
        print(f"pass {r}: " + " ".join(f"{n}={walls[n][-1]}" for n, _ in timed) + f" probe={probes[-1]}", flush=True)

    print("\nRESULT (min over passes):")
    for n, _ in timed:
        print(f"  {n}: min={min(walls[n])} all={walls[n]}")
    print(f"  probes={probes}")

    # stability demonstration: hashed ngram completes at the probe SF
    # on the same heap where the current string-element shape OOMs.
    t0 = time.time()
    dict(cases)["ngram_hashed"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    print(f"ngram_hashed @ {sf_dir}: completed in {round(time.time() - t0, 3)}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
