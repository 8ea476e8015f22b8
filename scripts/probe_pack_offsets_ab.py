"""A/B: broadcast-join offsets vs driver-literal offsets for
token_budget_batches on the sf10 pack input (expensive tokenize
lineage), alternating in one session.

Measured r15 (local[16]@4g/640): join 2.2-2.3s, literal 3.7-3.9s —
the join's two input evaluations overlap inside one job; the literal
design's totals collect serializes an extra evaluation first. This is
why the stitch is plan-adaptive: join by default, literal only for
ExistingRDD-backed frames where the join mis-binds (see
operators/packing.py). NOTE: old_pack below reconstructs the join
formulation inline so the A/B stays runnable regardless of which
path token_budget_batches picks for a file source."""
import math, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from bench_scaling import _make_spark
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from mldag_spark.operators.packing import _bucket_expr, token_budget_batches
from mldag_spark.functions import tokenize
from mldag_spark.queries.tables import load

spark = _make_spark("4g", cores=16, shuffle=640)
spark.sparkContext.setLogLevel("ERROR")

def counts():
    d = load(spark, "/root/repo/.testdata/sf10", "documents")
    return d.select("doc_id", F.size(tokenize(F.col("text"))).alias("n_tokens"))

def old_pack(df, id_col, count_col, max_tokens, num_partitions=0):
    n_buckets = int(num_partitions) or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        err = max(1e-4, 1.0 / (4.0 * n_buckets))
        bounds = sorted(set(df.stat.approxQuantile(id_col, probs, err)))
    else:
        bounds = []
    p = df.withColumn("_pid", _bucket_expr(id_col, bounds))
    w_local = Window.partitionBy("_pid").orderBy(id_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = p.withColumn("_lcum", F.sum(count_col).over(w_local))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = (local.groupBy("_pid").agg(F.sum(count_col).alias("_ptotal"))
               .withColumn("_offset", F.sum("_ptotal").over(w_off) - F.col("_ptotal"))
               .select("_pid", "_offset"))
    return local.join(F.broadcast(offsets), "_pid").select(
        id_col, count_col,
        (F.col("_lcum") + F.col("_offset")).alias("global_cum"),
        F.floor((F.col("_lcum") + F.col("_offset") - F.col(count_col)) / max_tokens).cast("int").alias("batch_id"))

def timeit(fn):
    t0 = time.time()
    n = fn().count()
    return time.time() - t0, n

# warm
timeit(lambda: old_pack(counts(), "doc_id", "n_tokens", 4096))
timeit(lambda: token_budget_batches(counts(), "doc_id", "n_tokens", 4096))
for i in range(3):
    to, no = timeit(lambda: old_pack(counts(), "doc_id", "n_tokens", 4096))
    tn, nn = timeit(lambda: token_budget_batches(counts(), "doc_id", "n_tokens", 4096))
    print(f"round {i}: old={to:.2f}s new={tn:.2f}s rows {no}/{nn}", flush=True)
