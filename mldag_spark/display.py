"""DAG rendering.

The reference ships a ~370-line graphviz renderer with HTML-table nodes,
port rows and nested clusters (``/root/reference/mldag/display.py``).
Graphviz is optional here: :func:`render` returns a ``graphviz.Digraph``
when the library is importable, and :func:`to_dot` always works,
emitting DOT source as a plain string (same visual structure: one record
node per DAG node with input/output port rows, solid dataflow edges
labeled with slot names, dashed order-only dependency edges).

The *physical* view — which the reference cannot have — is
:func:`explain`: per DAG output, the Catalyst plan of the DataFrame it
produced on the latest run.
"""

from __future__ import annotations

from typing import Optional

from mldag_spark.core.dag import MLDag, MLDagRun
from mldag_spark.core.node import NodeBase


def _ports(names: list[str], prefix: str) -> str:
    return "|".join(f"<{prefix}_{n}> {n}" for n in names)


def to_dot(dag: MLDag, name: str = "mldag") -> str:
    """DOT source for the DAG: record-shaped nodes with port rows."""
    lines = [f'digraph "{name}" {{', "  rankdir=LR;", '  node [shape=record];']
    for node in dag.node_dict.values():
        ins = _ports([s.name for s in node.inputs], "in")
        outs = _ports([s.name for s in node.outputs], "out")
        label = f"{{ {{{ins}}} | {node.name} | {{{outs}}} }}"
        lines.append(f'  "{node.name}" [label="{label}"];')
    for e in dag.edges:
        up = getattr(e.upstream, "name", None)
        down = getattr(e.downstream, "name", None)
        us = getattr(e, "upstream_slot", None)
        ds = getattr(e, "downstream_slot", None)
        if us and ds:
            lines.append(
                f'  "{up}":out_{us} -> "{down}":in_{ds} [label="{us}→{ds}"];'
            )
        else:
            lines.append(f'  "{up}" -> "{down}";')
    for node in dag.node_dict.values():
        for dep in node.dependencies.values():
            lines.append(
                f'  "{dep.name}" -> "{node.name}" [style=dashed, color=gray];'
            )
    for i in dag.inputs:
        lines.append(
            f'  "in_{i.name}" [shape=ellipse, style=dashed, label="{i.name}"];'
        )
        lines.append(f'  "in_{i.name}" -> "{i.node.name}":in_{i.slot};')
    for o in dag.outputs:
        lines.append(
            f'  "out_{o.name}" [shape=ellipse, style=dashed, label="{o.name}"];'
        )
        lines.append(f'  "{o.node.name}":out_{o.slot} -> "out_{o.name}";')
    lines.append("}")
    return "\n".join(lines)


def render(dag: MLDag, name: str = "mldag"):
    """A ``graphviz.Source`` when graphviz is installed, else DOT text."""
    dot = to_dot(dag, name=name)
    try:
        import graphviz  # type: ignore

        return graphviz.Source(dot)
    except ImportError:
        return dot


def explain(run: MLDagRun, mode: str = "formatted") -> str:
    """Concatenate Spark physical plans for every DataFrame DAG output
    of a completed run — the physical counterpart of :func:`to_dot`."""
    chunks = []
    for name, value in run.outputs.items():
        if hasattr(value, "_jdf"):  # a pyspark DataFrame
            plan = value._sc._jvm.PythonSQLUtils.explainString(
                value._jdf.queryExecution(), mode
            )
            chunks.append(f"== DAG output: {name} ==\n{plan}")
    return "\n".join(chunks)
