"""mldag_spark — a PySpark-native DAG pipeline/analytics engine.

A ground-up rebuild of the capabilities of ``artefom/mldag`` (a pure
Python fit/transform DAG orchestrator) designed Spark-first: DAG edges
carry lazy ``pyspark.sql.DataFrame``s, so composing nodes composes
Catalyst logical plans and all relational work (scan/filter/join/agg/
window/...) is executed by Spark with whole-stage codegen, AQE and
predicate pushdown — none of it re-implemented here.

Public API parity map (reference file:line cites in each class):

================  ====================================================
reference          mldag_spark
================  ====================================================
``MLDag``          :class:`mldag_spark.core.dag.MLDag`
``MLDagRun``       :class:`mldag_spark.core.dag.MLDagRun`
``MLDagMixin``     :class:`mldag_spark.core.dag.MLDagMixin`
``FunctionNode``   :class:`mldag_spark.core.node.FunctionNode`
``EstimatorNode``  :class:`mldag_spark.core.node.EstimatorNode`
``MLDagNode``      :class:`mldag_spark.core.node.MLDagNode`
``TransformNode``  :class:`mldag_spark.core.node.TransformNode`
``DummyNode``      :class:`mldag_spark.core.node.DummyNode`
``as_node``        :func:`mldag_spark.core.node.as_node`
``as_transform``   :func:`mldag_spark.core.node.as_transform` (fixed)
``@returns``       :func:`mldag_spark.core.introspect.returns`
================  ====================================================
"""

from mldag_spark.core.dag import (
    DagSlot,
    MLDag,
    MLDagInput,
    MLDagMixin,
    MLDagOutput,
    MLDagRun,
)
from mldag_spark.core.graph import Edge, Graph, Vertex
from mldag_spark.core.introspect import (
    InputSlot,
    OutputSlot,
    returns,
    set_function_return,
)
from mldag_spark.core.node import (
    DummyNode,
    EstimatorNode,
    FunctionNode,
    MLDagNode,
    NodeBase,
    NodeConnection,
    NodeSlot,
    TransformNode,
    as_node,
    cache_node,
    checkpoint_node,
    sql_node,
    as_transform,
)
from mldag_spark.exceptions import (
    GraphError,
    MLDagError,
    NodeExecutionError,
    SlotError,
)
from mldag_spark.persistence import load_dag, save_dag
from mldag_spark.sources import (
    read_source,
    sink_node,
    source_node,
    write_bucketed_table,
    write_sink,
)

__version__ = "0.1.0"

__all__ = [
    "MLDag", "MLDagRun", "MLDagMixin", "MLDagInput", "MLDagOutput", "DagSlot",
    "Graph", "Vertex", "Edge",
    "NodeBase", "FunctionNode", "EstimatorNode", "MLDagNode", "TransformNode",
    "DummyNode", "NodeConnection", "NodeSlot", "as_node", "as_transform",
    "sql_node", "cache_node", "checkpoint_node",
    "returns", "set_function_return", "InputSlot", "OutputSlot",
    "MLDagError", "GraphError", "SlotError", "NodeExecutionError",
    "save_dag", "load_dag",
    "read_source", "write_sink", "write_bucketed_table",
    "source_node", "sink_node",
]
