"""Source and sink nodes (SURVEY §2.3 scans/sources).

The reference has no I/O at all — inputs arrive as Python arguments
(`/root/reference/mldag/mldag.py:523-599`). Here sources/sinks are
first-class DAG nodes over ``spark.read``/``df.write``, declared so
Catalyst keeps pushdown/pruning (a source node returns the *lazy* scan;
filters composed downstream still reach the parquet reader).

Scale notes baked into the defaults:

- parquet/orc: no schema needed (footer metadata); predicate pushdown
  and column pruning on by default.
- csv/json: pass ``schema`` explicitly in production — ``inferSchema``
  is a full extra pass over the data (allowed here for small files).
- sinks default to snappy parquet, and expose ``partition_by`` (layout
  pruning) and ``bucket_by`` (pre-shuffled join/agg key co-location via
  ``saveAsTable``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from mldag_spark.core.node import FunctionNode

_READ_FORMATS = ("parquet", "orc", "csv", "json", "text")


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema=None,
    **options,
) -> DataFrame:
    """Lazy scan of a file source. ``options`` pass through to the
    reader (e.g. ``header=True`` for csv, ``pathGlobFilter=...``)."""
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def source_node(
    fmt: str, path: str, schema=None, name: Optional[str] = None, **options
) -> FunctionNode:
    """DAG node: (spark) → DataFrame scan."""

    # NB: no literal return annotation — the node port resolver treats
    # one as the declared output name (reference rule, SURVEY §1.2 ③)
    def source(spark: SparkSession):
        return read_source(spark, fmt, path, schema=schema, **options)

    source.__name__ = name or f"{fmt}_source"
    return FunctionNode(func=source, name=source.__name__)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
    compression: Optional[str] = None,
    **options,
) -> str:
    """Materialize ``df`` to a file sink; returns the path (so a sink
    node has a slot-compatible scalar output)."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> str:
    """Bucketed managed table: pre-shuffles on ``bucket_cols`` so later
    joins/aggregations on those keys are exchange-free (the 100 TB
    co-location strategy for repeatedly-joined fact tables).

    The input is repartitioned onto the bucket key first so every
    bucket lands in ONE file: without this, each of the writer's input
    partitions emits its own file per bucket. Measured r6 at sf1.0:
    the one-file layout alone turns the bucketed join from 11% slower
    than plain (multi-file buckets scatter each key across files) to
    1.19x faster. To ALSO eliminate the per-join Sort, readers must
    set ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``:
    Spark only trusts sortBy metadata when every bucket is a single
    file, and disabled the optimization by default because multi-file
    buckets made it unsafe — this writer restores the guarantee the
    config needs (plan-pinned: zero Exchange AND zero Sort below the
    join in ``test_plans``). One file per bucket also bounds
    small-file count at |buckets|, not |buckets|x|input partitions|. Writer memory: each task holds ONE
    parquet row-group buffer (vs one per bucket before); size
    |buckets| so a bucket's rows fit an executor's writer budget —
    at 100 TB that means thousands of buckets, and in a small local
    heap it means not bucketing a multi-GB table into 32 files."""
    if mode == "append":
        # appending adds n_buckets MORE files, so every bucket becomes
        # multi-file; under the sorted-bucket-scan read config that
        # silently yields wrong join output (Spark trusts sortBy
        # metadata it can no longer honor). Rebuild instead.
        raise ValueError(
            "write_bucketed_table cannot append: it would break the "
            "one-file-per-bucket invariant the sorted bucketed read "
            "depends on; rewrite the table (mode='overwrite')"
        )
    writer = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return table


def write_sorted_layout(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int = 32,
    sort_within: Optional[list[str]] = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> str:
    """Range-partitioned, internally-sorted file layout: global range
    partition on ``range_cols`` (sampled quantile boundaries, so files
    hold disjoint key ranges) + a within-file sort.

    Why it matters at 100 TB: parquet stores per-row-group min/max
    statistics. With disjoint sorted ranges, a predicate on the layout
    key prunes whole files/row-groups at scan time instead of reading
    and filtering — the poor man's clustered index, and the single
    biggest scan-cost lever after column pruning. ``sort_within`` adds
    a secondary key for locality inside each file (Z-order-lite: one
    leading dimension exact, one secondary clustered).
    """
    out = df.repartitionByRange(n_files, *[F.col(c) for c in range_cols])
    out = out.sortWithinPartitions(*(sort_within or range_cols))
    out.write.format(fmt).mode(mode).save(path)
    return path


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str,
    order_col: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> str:
    """Loader-ready training-shard layout: one directory per shard
    (``partitionBy``), rows inside each shard's files sorted by
    ``order_col`` — the materialization step after
    ``sample_global_shuffle`` assigns (shard_id, pos).

    Scale shape: ``repartition(shard_col)`` co-locates each shard on
    one task (one shuffle, keyed by the low-cardinality shard id — at
    100 TB raise the shard count so a shard fits an executor), and the
    within-partition sort is per-shard, never global. A data loader
    then streams shard files in order with zero client-side shuffling.
    """
    (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.format(fmt)
        .mode(mode)
        .partitionBy(shard_col)
        .save(path)
    )
    return path


def sink_node(
    path: str,
    fmt: str = "parquet",
    name: Optional[str] = None,
    **kwargs,
) -> FunctionNode:
    """DAG node: (df) → path, materializing the upstream plan."""

    def sink(df: DataFrame):
        return write_sink(df, path, fmt=fmt, **kwargs)

    sink.__name__ = name or f"{fmt}_sink"
    return FunctionNode(func=sink, name=sink.__name__)
