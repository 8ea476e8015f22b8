"""Source/sink node tests: formats, lazy pushdown, DAG integration."""

from __future__ import annotations

from pyspark.sql import functions as F

import mldag_spark as m
from mldag_spark.sources import (
    read_source,
    sink_node,
    source_node,
    write_sink,
)


def test_formats_roundtrip(tmp_path, spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    want = sorted(r["n_name"] for r in df.collect())
    for fmt, opts in [
        ("parquet", {}),
        ("orc", {}),
        ("json", {}),
        ("csv", {"header": True}),
    ]:
        path = str(tmp_path / fmt)
        write_sink(df, path, fmt=fmt, **opts)
        read_opts = dict(opts)
        if fmt == "csv":
            read_opts["inferSchema"] = True
        back = read_source(spark, fmt, path, **read_opts)
        assert sorted(r["n_name"] for r in back.collect()) == want


def test_source_pushdown_reaches_scan(spark, sf_dir):
    src = read_source(spark, "parquet", f"{sf_dir}/lineitem.parquet")
    q = src.filter(F.col("l_quantity") > 49).select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan
    # column pruning: the scan reads 2 columns, not 11
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_source_sink_nodes_in_dag(tmp_path, spark, sf_dir):
    dag = m.MLDag()
    src = source_node("parquet", f"{sf_dir}/region.parquet")
    dag["spark"] >> src

    def upper_names(df):
        return df.select(F.upper("r_name").alias("r"))

    mid = m.as_node(upper_names)
    src >> mid
    out_path = str(tmp_path / "out")
    snk = sink_node(out_path)
    mid >> snk
    snk["result"] >> dag["path"]

    run = dag.transform(spark)
    assert run.outputs["path"] == out_path
    back = spark.read.parquet(out_path)
    assert back.count() == 5


def test_bucketed_join_is_exchange_free(tmp_path, spark, sf_dir):
    """write_bucketed_table pre-shuffles on the join key, so a
    bucket-aligned join of two such tables must plan WITHOUT a shuffle
    (no Exchange on either side) — the co-location strategy the module
    docstring promises for repeatedly-joined 100 TB fact tables."""
    from mldag_spark.sources import write_bucketed_table

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/bk'"
    )
    # sf0.001 tables are broadcast-sized; disable auto-broadcast so the
    # planner actually faces the shuffle-vs-bucket decision under test
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_bucketed_table(
            orders, "bktest.orders_bk", ["o_orderkey"], n_buckets=4
        )
        write_bucketed_table(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bktest.lineitem_bk",
            ["o_orderkey"],
            n_buckets=4,
        )
        joined = spark.table("bktest.orders_bk").join(
            spark.table("bktest.lineitem_bk"), "o_orderkey"
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan       # bucket co-location held
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_partitioned_write_prunes_partitions(tmp_path, spark, sf_dir):
    """write_sink(partition_by=['lang']) must produce a layout where a
    lang filter becomes a PartitionFilter (pruned at planning, no data
    read from other partitions) rather than a post-scan filter."""
    from mldag_spark.sources import write_sink

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_sink(docs, path, partition_by=["lang"])

    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "lang" in part_lines[0], plan
    n_en = docs.filter(F.col("lang") == "en").count()
    assert back.count() == n_en


def test_sorted_layout_prunes_files_on_range_predicate(spark, sf_dir, tmp_path):
    from mldag_spark.sources import write_sorted_layout
    from mldag_spark.queries.tables import load

    path = str(tmp_path / "orders_sorted")
    write_sorted_layout(
        load(spark, sf_dir, "orders"),
        path,
        range_cols=["o_orderdate"],
        n_files=8,
        sort_within=["o_orderdate", "o_orderkey"],
    )
    back = spark.read.parquet(path)
    # same data round-trips
    assert back.count() == load(spark, sf_dir, "orders").count()

    # a narrow date predicate must NOT read every file: disjoint ranges
    # + parquet min/max stats let the scan skip non-matching files
    sel = back.filter(F.col("o_orderdate") == "1995-06-15")
    metrics = sel._jdf.queryExecution().executedPlan().toString()
    sel.count()
    # pushed filter reaches the scan
    assert "PushedFilters: [IsNotNull(o_orderdate), EqualTo(o_orderdate" in metrics
    # and the matching rows live in exactly one range partition: the
    # per-file row-group stats bound the scan output well below the table
    import glob, pyarrow.parquet as pq

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) >= 4
    import datetime

    probe = datetime.datetime(1995, 6, 15)
    overlapping = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("o_orderdate")
        stats = md.row_group(0).column(col_idx).statistics
        lo, hi = stats.min, stats.max
        if not isinstance(lo, datetime.datetime):
            lo = datetime.datetime.combine(lo, datetime.time())
            hi = datetime.datetime.combine(hi, datetime.time())
        if lo <= probe <= hi:
            overlapping += 1
    assert overlapping <= 2, [f for f in files]


def test_write_training_shards_layout(spark, tmp_path):
    """Shard export contract: one directory per shard id, every
    shard's rows sorted by pos inside the files, full set equality
    with the input — the loader-ready layout sample_global_shuffle's
    docstring promises."""
    from mldag_spark.queries import REGISTRY
    from tests.conftest import SF_DIR
    from mldag_spark.sources import write_training_shards

    shuffled = REGISTRY["sample_global_shuffle"](spark, SF_DIR)
    out = str(tmp_path / "shards")
    write_training_shards(shuffled, out, "shard_id", "pos")

    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == 8
    back = spark.read.parquet(out)
    assert back.count() == shuffled.count()
    # per-shard files must be internally ordered by pos
    import pyarrow.parquet as pq

    for d in dirs:
        full = os.path.join(out, d)
        for f in sorted(os.listdir(full)):
            if not f.endswith(".parquet"):
                continue
            pos = pq.read_table(os.path.join(full, f), columns=["pos"])["pos"].to_pylist()
            assert pos == sorted(pos), f"unsorted shard file {d}/{f}"


def test_write_training_shards_deterministic_bytes(spark, tmp_path):
    """Two writes of the same export plan must produce byte-identical
    shard files — including when the INPUT arrives with different
    physical partitioning. The writer owns its layout end-to-end:
    repartition(shard_col) re-clusters each shard onto one task
    regardless of upstream layout, and the within-partition
    (shard, order) sort fixes row order, so shard bytes are a pure
    function of the data. That is what makes the export resumable and
    diffable: re-running a shard job on a differently-sized cluster
    yields the same artifacts."""
    import hashlib
    import os

    from mldag_spark.queries import REGISTRY
    from mldag_spark.sources import write_training_shards
    from tests.conftest import SF_DIR

    shuffled = REGISTRY["sample_global_shuffle"](spark, SF_DIR)

    def shard_hashes(df, out):
        write_training_shards(df, out, "shard_id", "pos")
        hashes = {}
        for d in sorted(os.listdir(out)):
            if not d.startswith("shard_id="):
                continue
            files = sorted(
                f
                for f in os.listdir(os.path.join(out, d))
                if f.endswith(".parquet")
            )
            assert len(files) == 1, f"{d}: expected one file, got {files}"
            with open(os.path.join(out, d, files[0]), "rb") as fh:
                hashes[d] = hashlib.sha256(fh.read()).hexdigest()
        return hashes

    base = shard_hashes(shuffled, str(tmp_path / "a"))
    assert len(base) == 8
    # same plan, second run
    assert shard_hashes(shuffled, str(tmp_path / "b")) == base
    # different upstream physical partitioning
    assert shard_hashes(shuffled.repartition(7), str(tmp_path / "c")) == base
    assert shard_hashes(shuffled.repartition(13), str(tmp_path / "d")) == base


def test_bucketed_table_one_file_per_bucket(spark, tmp_path):
    """The r6 layout contract: exactly n_buckets data files, so the
    bucketed reader never sees a multi-file (= treated-as-unsorted)
    bucket and bucket count bounds small-file count."""
    import glob
    import os

    from mldag_spark.sources import write_bucketed_table
    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(7)
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS src_bucket LOCATION '{tmp_path}/wh'"
    )
    try:
        write_bucketed_table(
            li.select("l_orderkey", "l_quantity"),
            "src_bucket.li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        )
        loc = (
            spark.sql("DESCRIBE EXTENDED src_bucket.li_b")
            .filter("col_name = 'Location'").first()["data_type"]
        )
        files = glob.glob(os.path.join(loc.replace("file:", ""), "*.parquet"))
        assert len(files) == 8, sorted(files)
    finally:
        spark.sql("DROP DATABASE IF EXISTS src_bucket CASCADE")


def test_shingle_rows_zip_equals_reference(spark):
    """The r8 zip-slice shingle builder must produce the byte-identical
    ROW MULTISET of the r2 posexplode + window-lead formulation it
    replaced (including edge docs: empty, whitespace-only, shorter
    than k, exactly k, k+1 tokens, and internal duplicate shingles)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mldag_spark.functions import shingle_rows, tokenize

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b"),                      # shorter than k
            (3, "a b c"),                    # exactly k
            (4, "a b c d"),                  # k + 1
            (5, ""),                         # empty: single "" shingle
            (6, "   "),                      # whitespace-only: same
            (7, "x y z x y z x y z"),        # duplicate shingles kept
            (8, "solo"),
        ],
        ["doc_id", "text"],
    )
    k = 3

    # reference: the replaced window formulation, inlined verbatim
    toks = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("_pos", "_t")
    )
    w = Window.partitionBy("doc_id").orderBy("_pos")
    leads = [F.col("_t")] + [F.lead("_t", i).over(w) for i in range(1, k)]
    n = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ref = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", *leads).alias("shingle"),
            F.col("_pos").alias("_pos"),
            n.alias("_n"),
        )
        .filter(
            (F.col("_pos") <= F.col("_n") - k)
            | ((F.col("_n") <= k) & (F.col("_pos") == 0))
        )
        .select("doc_id", "shingle")
    )

    got = sorted(map(tuple, shingle_rows(docs, "doc_id", "text", k).collect()))
    want = sorted(map(tuple, ref.collect()))
    assert got == want
    assert (1, "a b c") in got and (1, "d e f") in got
    assert (2, "a b") in got and (8, "solo") in got
    # tokenize("") yields [""], so empty/whitespace docs produce one
    # empty-string shingle in BOTH formulations (parity, not policy —
    # dedup consumers treat it as any other shingle value)
    assert got.count((5, "")) == 1 and got.count((6, "")) == 1
    assert got.count((7, "x y z")) == 3  # duplicates preserved
