"""DAG persistence: JSON plan + per-node payloads.

The reference's ``to_dict``/``from_dict`` does not survive a round trip
(`/root/reference/mldag/core/graph.py:1030-1077` — node payloads are
dropped and ``from_dict`` raises on real DAGs; SURVEY §2.2 [verified
broken]) and its per-node ``dump``/``load`` is bare pickling
(`mldagbase.py:954-977`). This module makes persistence actually work,
Spark-style:

- ``plan.json``   — the structural graph (``MLDag.to_dict``), node
  kinds, and payload manifest
- ``nodes/<name>/``
    - FunctionNode: pickled callable (module-level functions only — the
      same contract as ``pyspark`` closures)
    - EstimatorNode: ``model.write().save()`` when the fitted payload
      is a pyspark.ml ``MLWritable`` (cluster-safe, JVM-format), pickle
      otherwise; the raw estimator is pickled alongside
- nested ``MLDagNode``s recurse into subdirectories
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Callable, Optional

from mldag_spark.core.dag import MLDag
from mldag_spark.core.node import (
    DummyNode,
    EstimatorNode,
    FunctionNode,
    MLDagNode,
    NodeBase,
    TransformNode,
)


def _node_kind(node: NodeBase) -> str:
    for kind, cls in _KINDS.items():
        if type(node) is cls:
            return kind
    raise TypeError(f"cannot persist node type {type(node).__name__}")


_KINDS = {
    "function": FunctionNode,
    "estimator": EstimatorNode,
    "mldag": MLDagNode,
    "transform": TransformNode,
    "dummy": DummyNode,
}


def _is_ml_writable(obj) -> bool:
    return hasattr(obj, "write") and hasattr(obj, "save")


def save_dag(dag: MLDag, path: str) -> None:
    """Persist structure + payloads under ``path`` (local or DBFS-style
    mounted path; Spark ML payloads go through Hadoop FS writers)."""
    os.makedirs(path, exist_ok=True)
    plan = dag.to_dict()
    manifest: dict[str, dict] = {}
    for name, node in dag.node_dict.items():
        nd = os.path.join(path, "nodes", name)
        os.makedirs(nd, exist_ok=True)
        kind = _node_kind(node)
        entry: dict = {"kind": kind}
        if kind == "function":
            try:
                payload = pickle.dumps(node.func)
                with open(os.path.join(nd, "func.pkl"), "wb") as f:
                    f.write(payload)
            except (pickle.PicklingError, AttributeError, TypeError):
                # lambdas/closures: structure still round-trips; the
                # caller re-supplies the callable via load overrides
                entry["payload"] = "unpicklable"
        elif kind == "estimator":
            est = node.estimator
            if _is_ml_writable(est):
                est.write().overwrite().save(os.path.join(nd, "estimator"))
                entry["estimator"] = {
                    "format": "spark-ml",
                    "class": f"{type(est).__module__}.{type(est).__name__}",
                }
            else:
                with open(os.path.join(nd, "estimator.pkl"), "wb") as f:
                    pickle.dump(est, f)
                entry["estimator"] = {"format": "pickle"}
            model = getattr(node, "model", None)
            if model is not None:
                if _is_ml_writable(model):
                    model.write().overwrite().save(os.path.join(nd, "model"))
                    entry["model"] = {
                        "format": "spark-ml",
                        "class": f"{type(model).__module__}."
                                 f"{type(model).__name__}",
                    }
                else:
                    with open(os.path.join(nd, "model.pkl"), "wb") as f:
                        pickle.dump(model, f)
                    entry["model"] = {"format": "pickle"}
        elif kind == "mldag":
            save_dag(node.mldag, os.path.join(nd, "subdag"))
        elif kind == "transform":
            entry["parent"] = node.parent_node_name
        deps = {
            dep_name: dep.name
            for dep_name, dep in getattr(node, "dependencies", {}).items()
            if not (kind == "transform" and dep_name == "transformer")
        }
        if deps:
            entry["dependencies"] = deps
        manifest[name] = entry
    plan["nodes"] = manifest
    with open(os.path.join(path, "plan.json"), "w") as f:
        json.dump(plan, f, indent=2, default=str)


def load_dag(
    path: str,
    overrides: Optional[dict[str, Callable]] = None,
) -> MLDag:
    """Rebuild a DAG saved by :func:`save_dag`.

    ``overrides`` maps node name → callable for FunctionNodes whose
    payloads were not picklable (lambdas/closures); pickled payloads
    load without it.
    """
    overrides = overrides or {}
    with open(os.path.join(path, "plan.json")) as f:
        plan = json.load(f)
    nodes: dict[str, NodeBase] = {}
    for name, entry in plan["nodes"].items():
        nd = os.path.join(path, "nodes", name)
        kind = entry["kind"]
        if kind == "function":
            if name in overrides:
                func = overrides[name]
            elif entry.get("payload") == "unpicklable":
                raise ValueError(
                    f"node {name!r} was saved without its callable "
                    f"(lambda/closure); pass overrides={{{name!r}: fn}}"
                )
            else:
                with open(os.path.join(nd, "func.pkl"), "rb") as f:
                    func = pickle.load(f)
            nodes[name] = FunctionNode(func=func, name=name)
        elif kind == "estimator":
            einfo = entry.get("estimator", {"format": "pickle"})
            if einfo["format"] == "spark-ml":
                est = _load_ml(einfo["class"], os.path.join(nd, "estimator"))
            else:
                with open(os.path.join(nd, "estimator.pkl"), "rb") as f:
                    est = pickle.load(f)
            node = EstimatorNode(estimator=est, name=name)
            minfo = entry.get("model")
            if minfo:
                if minfo["format"] == "spark-ml":
                    node.model = _load_ml(minfo["class"],
                                          os.path.join(nd, "model"))
                else:
                    with open(os.path.join(nd, "model.pkl"), "rb") as f:
                        node.model = pickle.load(f)
            nodes[name] = node
        elif kind == "mldag":
            sub = load_dag(os.path.join(nd, "subdag"), overrides)
            nodes[name] = MLDagNode(mldag=sub, name=name)
        elif kind == "transform":
            nodes[name] = TransformNode(
                parent_node_name=entry["parent"], name=name
            )
        elif kind == "dummy":
            nodes[name] = DummyNode(name=name)
    dag = MLDag.from_dict(plan, nodes)
    for name, entry in plan["nodes"].items():
        for dep_name, target in entry.get("dependencies", {}).items():
            nodes[name].add_dependency(nodes[target], name=dep_name)
    return dag


def _load_ml(class_path: str, path: str):
    import importlib

    mod, cls_name = class_path.rsplit(".", 1)
    cls = getattr(importlib.import_module(mod), cls_name)
    return cls.load(path)
