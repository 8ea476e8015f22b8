"""Sequence/shard packing for training-data export.

:func:`token_budget_batches` assigns documents (ordered by id) to
contiguous batches of at most ``max_tokens`` tokens — the sharding
step before writing training shards of bounded size.

The interesting part is the GLOBAL running sum. The naive
formulation — ``sum().over(Window.orderBy(id))`` with no partition
key — collapses the whole dataset into one task and dies at scale.
This module uses the distributed prefix-sum instead:

1. ``repartitionByRange(id)`` so partitions hold contiguous id ranges;
2. a *local* cumulative sum per partition (window partitioned by
   ``spark_partition_id()`` — fully parallel);
3. per-partition totals (|partitions| rows) cumulated into offsets and
   broadcast-joined back;
4. global cumsum = local cumsum + partition offset.

The result is partition-invariant: a prefix sum over a total order
(unique ids) does not depend on where range sampling happens to place
partition boundaries, so batch ids are deterministic across cluster
sizes — pinned by a test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def token_budget_batches(
    df: DataFrame,
    id_col: str,
    count_col: str,
    max_tokens: int,
    num_partitions: int = 0,
) -> DataFrame:
    """(id, count, global_cum, batch_id) — contiguous token-budget
    sharding in id order.

    ``batch_id = floor((global_cum - count) / max_tokens)``: a batch
    boundary falls wherever the running total crosses a multiple of
    ``max_tokens``, so every batch holds <= ``max_tokens`` tokens plus
    at most one straddling document (the standard shard-packing
    contract; split oversized documents upstream if hard caps are
    required).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    ranged = (
        df.repartitionByRange(num_partitions, F.col(id_col))
        if num_partitions
        else df.repartitionByRange(F.col(id_col))
    )
    p = ranged.withColumn("_pid", F.spark_partition_id())

    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = p.withColumn("_lcum", F.sum(count_col).over(w_local))
    # Both downstream consumers (the offsets aggregate and the final
    # join) key on `_pid`, which is only meaningful if they observe the
    # SAME range boundaries. No cache is needed for that:
    # RangePartitioner samples each input partition with a seed derived
    # from the partition index (byteswap32(idx)), so even when the two
    # plan branches each run their own exchange instead of reusing one,
    # they sample identical boundaries from the same deterministic
    # input. (Verified empirically: two un-reused rangepartitioning
    # exchanges, zero prefix-sum mismatches, stable across actions.)
    # The earlier persist()-based pinning leaked a corpus-sized cache
    # entry for the caller's whole session — at 100 TB that is the
    # difference between a streaming-through plan and an eviction storm.

    # per-partition totals: |partitions| rows — a tiny single-partition
    # window here is fine and broadcast-joins back
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(count_col).alias("_ptotal"))
        .withColumn("_offset", F.sum("_ptotal").over(w_off) - F.col("_ptotal"))
        .select("_pid", "_offset")
    )

    out = local.join(F.broadcast(offsets), "_pid").select(
        id_col,
        count_col,
        (F.col("_lcum") + F.col("_offset")).alias("global_cum"),
        F.floor(
            (F.col("_lcum") + F.col("_offset") - F.col(count_col))
            / max_tokens
        )
        .cast("int")
        .alias("batch_id"),
    )
    return out
