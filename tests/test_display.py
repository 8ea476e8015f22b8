"""Display: DOT structure and the physical explain view."""

from __future__ import annotations

from pyspark.sql import functions as F

import mldag_spark as m
from mldag_spark.display import explain, to_dot


def region_count(df):
    return df.groupBy("r_name").agg(F.count(F.lit(1)).alias("n"))


def test_to_dot_structure():
    dag = m.MLDag()
    n1 = dag["df"] >> m.as_node(region_count)
    n1["result"] >> dag["counts"]
    dot = to_dot(dag)
    assert "digraph" in dot
    assert "region_count" in dot
    assert '"in_df"' in dot and '"out_counts"' in dot


def test_explain_shows_physical_plan(spark, sf_dir):
    dag = m.MLDag()
    n1 = dag["df"] >> m.as_node(region_count)
    n1["result"] >> dag["counts"]
    run = dag.transform(spark.read.parquet(f"{sf_dir}/region.parquet"))
    text = explain(run)
    assert "DAG output: counts" in text
    assert "HashAggregate" in text or "Aggregate" in text
    assert "Scan parquet" in text or "FileScan" in text
