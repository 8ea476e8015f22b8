"""Query registry: every implemented operator/query exposed to the
driver contract (``__spark_entry__.queries()`` / ``oracle_sql()``).

Each module registers ``(name, spark_fn, oracle_sql_or_None)`` tuples;
``REGISTRY`` maps name → spark callable, ``ORACLES`` maps name → ANSI
SQL for the DuckDB side-by-side correctness gate. Queries whose
semantics are not SQL-expressible (hash-dependent LSH bucketing,
streaming state) register ``None`` and get the weaker rows-only check.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator registering a query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for side effect: each module registers its queries
    from mldag_spark.queries import (  # noqa: F401
        dag_pipeline,
        events,
        graph,
        multimodal,
        relational,
        relational_ext,
        streaming,
        text,
        vectors,
    )


_load_all()
