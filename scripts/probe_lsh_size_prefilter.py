#!/usr/bin/env python
"""Probe: size-ratio prefilter on LSH candidate pairs before the
element-join verification.

Hypothesis: for jaccard(A,B) >= t it is necessary that
min(|A|,|B|) / max(|A|,|B|) >= t (since jac <= min/max), so joining
candidates to the per-doc size table FIRST and dropping pairs that
fail `den*min >= num*max` (exact integer form of the clamped
threshold fraction) prunes LSH false-positive candidates before the
expensive candidate×element-rows join. The sizes join is pair-keyed
(tiny side = 1 row/doc), so the question is whether the pruning pays
for the extra early joins on this corpus.

Measures at $SPARK_GRAFT_SF_DIR (default sf0.1), warm, min of 3:
  A) current full dedup_minhash_lsh wall
  B) candidate count / survivors of the size filter (pruning power)
  C) variant wall with the prefilter inserted
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mldag_spark.functions import shingle_rows
    from mldag_spark.operators import dedup as D

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mk_rows = lambda: shingle_rows(d, "doc_id", "text", 3)  # noqa: E731

    t = 0.8
    num, den = 4, 5  # Fraction(0.8) == 4/5 exactly

    def current():
        return D.minhash_lsh_pairs_rows(
            mk_rows(), "doc_id", "shingle", threshold=t,
            num_hashes=64, bands=16,
        )

    def candidates_and_rows():
        rows = mk_rows().repartition(F.col("doc_id"))
        banded = D.minhash_band_index(rows, "doc_id", "shingle", 64, 16)
        a = banded.alias("a")
        b = banded.hint("merge").alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        return cand, rows

    def variant():
        cand, rows = candidates_and_rows()
        ex = rows.select("doc_id", F.col("shingle").alias("_e")).distinct()
        sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("_n").alias("_na"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("_n").alias("_nb"))
        pruned = (
            cand.join(sa.hint("merge"), "doc_a")
            .join(sb.hint("merge"), "doc_b")
            .filter(
                F.lit(den) * F.least("_na", "_nb")
                >= F.lit(num) * F.greatest("_na", "_nb")
            )
            .select("doc_a", "doc_b")
        )
        return D._verify_pairs_by_rows(
            pruned, rows, "doc_id", "shingle", "doc_a", "doc_b", t
        )

    def timed(mk, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            mk().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # warm
    current().write.mode("overwrite").format("noop").save()

    cand, rows = candidates_and_rows()
    ex = rows.select("doc_id", F.col("shingle").alias("_e")).distinct()
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("_n").alias("_nb"))
    joined = cand.join(sa, "doc_a").join(sb, "doc_b")
    n_cand = joined.count()
    n_keep = joined.filter(
        F.lit(den) * F.least("_na", "_nb")
        >= F.lit(num) * F.greatest("_na", "_nb")
    ).count()
    print(f"candidates={n_cand} survive_size_filter={n_keep} "
          f"pruned={100.0 * (n_cand - n_keep) / max(1, n_cand):.1f}%")

    ta = timed(current)
    tc = timed(variant)
    na = current().count()
    nc = variant().count()
    print(f"current  wall={ta}s rows={na}")
    print(f"variant  wall={tc}s rows={nc}")
    print("MATCH" if na == nc else "MISMATCH", "delta",
          round(ta - tc, 3), "s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
