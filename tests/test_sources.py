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
