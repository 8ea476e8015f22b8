"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query through the mldag_spark DAG
engine; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (and the extended training-data-pipeline
surface) for the DuckDB side-by-side correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary at sf0.001, executed
    through the DAG engine (DSL → topo scheduler → Catalyst plan)."""
    import mldag_spark as m
    from mldag_spark.queries.relational import q1_pricing_summary

    dag = m.MLDag()

    def pricing_summary(sf_dir):
        return q1_pricing_summary(spark, sf_dir)

    node = dag["sf_dir"] >> m.as_node(pricing_summary)
    node["result"] >> dag["summary"]
    run = dag.transform("/root/testdata/sf0.001")
    return run.outputs["summary"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2.3 +
    extended analytics surface)."""
    from mldag_spark.queries import REGISTRY

    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases).

    Queries absent here (LSH/SimHash bucketing, HLL sketches) are
    hash-function-specific by design and get the rows-only check.
    """
    from mldag_spark.queries import ORACLES

    return dict(ORACLES)
