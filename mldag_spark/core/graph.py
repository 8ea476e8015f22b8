"""Generic directed-graph metadata layer.

This is the structural substrate of the DAG engine: vertices, directed
edges (parallel edges allowed), adjacency queries, root/leaf discovery
and breadth-first/topological iteration.

Parity notes (behavior, not code, from the reference):
- a vertex belongs to at most one graph at a time; connecting two
  unattached vertices raises, and graph membership propagates from the
  attached side (``/root/reference/mldag/core/graph.py:80-127``)
- multiple parallel edges between the same vertex pair are allowed
  (``graph.py:657-689`` has plural ``get_edges``)
- BFS iteration from roots; a graph with vertices but no roots is
  cyclic and iteration raises (``graph.py:450-489``)

Unlike the reference we keep adjacency in insertion-ordered dicts and
never re-sort on access (the reference sorts vertices/edges by id on
every accessor call, flagged TODO at ``graph.py:927,932``).
"""

from __future__ import annotations

import itertools
from typing import Iterator, Optional

from mldag_spark.exceptions import GraphError


class Vertex:
    """A graph vertex. Belongs to at most one :class:`Graph` at a time."""

    def __init__(self) -> None:
        self._graph: Optional["Graph"] = None
        self._id: Optional[int] = None

    # -- graph membership -------------------------------------------------
    @property
    def graph(self) -> Optional["Graph"]:
        return self._graph

    @graph.setter
    def graph(self, graph: Optional["Graph"]) -> None:
        if graph is self._graph:
            return
        if self._graph is not None and graph is not None:
            raise GraphError(
                f"{self!r} already belongs to a graph; detach it first"
            )
        if graph is not None:
            graph.add_vertex(self)
        else:
            old = self._graph
            self._graph = None
            if old is not None and self in old._vertices.values():
                old.remove_vertex(self)

    def _resolve_common_graph(self, other: "Vertex") -> "Graph":
        """Attach ``self``/``other`` to a single common graph, or raise.

        Membership propagates from whichever side is already attached;
        two vertices attached to *different* graphs cannot be wired.
        """
        if self._graph is not None and other._graph is not None:
            if self._graph is not other._graph:
                raise GraphError(
                    "cannot connect vertices that belong to different graphs"
                )
            return self._graph
        if self._graph is not None:
            other.graph = self._graph
            return self._graph
        if other._graph is not None:
            self.graph = other._graph
            return other._graph
        raise GraphError(
            "cannot connect two vertices when neither belongs to a graph"
        )


class Edge:
    """Directed edge ``upstream -> downstream``."""

    def __init__(self, upstream: Vertex, downstream: Vertex) -> None:
        self.upstream = upstream
        self.downstream = downstream
        self._id: Optional[int] = None
        self._graph: Optional["Graph"] = None

    def __repr__(self) -> str:
        return f"<Edge {self.upstream!r} -> {self.downstream!r}>"


class Graph:
    """Container of vertices and directed edges with adjacency indexes."""

    def __init__(self) -> None:
        self._vertices: dict[int, Vertex] = {}
        self._edges: dict[int, Edge] = {}
        # vertex-id -> list of edge-ids
        self._downstream_edges: dict[int, list[int]] = {}
        self._upstream_edges: dict[int, list[int]] = {}
        self._vertex_counter = itertools.count()
        self._edge_counter = itertools.count()

    # -- vertices ---------------------------------------------------------
    @property
    def vertices(self) -> list[Vertex]:
        return list(self._vertices.values())

    def add_vertex(self, vertex: Vertex) -> Vertex:
        if vertex._graph is self:
            return vertex
        if vertex._graph is not None:
            raise GraphError(f"{vertex!r} already belongs to another graph")
        vid = next(self._vertex_counter)
        vertex._id = vid
        vertex._graph = self
        self._vertices[vid] = vertex
        self._downstream_edges[vid] = []
        self._upstream_edges[vid] = []
        self._on_vertex_added(vertex)
        return vertex

    def remove_vertex(self, vertex: Vertex) -> None:
        self._check_mine(vertex)
        vid = vertex._id
        assert vid is not None
        for eid in list(self._downstream_edges[vid]) + list(self._upstream_edges[vid]):
            if eid in self._edges:
                self.remove_edge(self._edges[eid])
        del self._vertices[vid]
        del self._downstream_edges[vid]
        del self._upstream_edges[vid]
        vertex._graph = None
        vertex._id = None
        self._on_vertex_removed(vertex)

    def _check_mine(self, vertex: Vertex) -> None:
        if vertex._graph is not self or vertex._id not in self._vertices:
            raise GraphError(f"{vertex!r} does not belong to this graph")

    # subclass hooks
    def _on_vertex_added(self, vertex: Vertex) -> None:  # pragma: no cover
        pass

    def _on_vertex_removed(self, vertex: Vertex) -> None:  # pragma: no cover
        pass

    # -- edges ------------------------------------------------------------
    @property
    def edges(self) -> list[Edge]:
        return list(self._edges.values())

    def add_edge(self, edge: Edge) -> Edge:
        for v in (edge.upstream, edge.downstream):
            if v._graph is None:
                self.add_vertex(v)
            elif v._graph is not self:
                raise GraphError(
                    f"edge endpoint {v!r} belongs to a different graph"
                )
        eid = next(self._edge_counter)
        edge._id = eid
        edge._graph = self
        self._edges[eid] = edge
        self._downstream_edges[edge.upstream._id].append(eid)  # type: ignore[index]
        self._upstream_edges[edge.downstream._id].append(eid)  # type: ignore[index]
        return edge

    def remove_edge(self, edge: Edge) -> None:
        if edge._graph is not self or edge._id not in self._edges:
            raise GraphError(f"{edge!r} does not belong to this graph")
        eid = edge._id
        assert eid is not None
        self._downstream_edges[edge.upstream._id].remove(eid)  # type: ignore[index]
        self._upstream_edges[edge.downstream._id].remove(eid)  # type: ignore[index]
        del self._edges[eid]
        edge._graph = None
        edge._id = None

    def connect(self, upstream: Vertex, downstream: Vertex) -> Edge:
        return self.add_edge(Edge(upstream, downstream))

    # -- adjacency queries ------------------------------------------------
    def get_downstream_edges(self, vertex: Vertex) -> list[Edge]:
        self._check_mine(vertex)
        return [self._edges[eid] for eid in self._downstream_edges[vertex._id]]  # type: ignore[index]

    def get_upstream_edges(self, vertex: Vertex) -> list[Edge]:
        self._check_mine(vertex)
        return [self._edges[eid] for eid in self._upstream_edges[vertex._id]]  # type: ignore[index]

    def get_downstream_vertices(self, vertex: Vertex) -> list[Vertex]:
        seen: list[Vertex] = []
        for e in self.get_downstream_edges(vertex):
            if e.downstream not in seen:
                seen.append(e.downstream)
        return seen

    def get_upstream_vertices(self, vertex: Vertex) -> list[Vertex]:
        seen: list[Vertex] = []
        for e in self.get_upstream_edges(vertex):
            if e.upstream not in seen:
                seen.append(e.upstream)
        return seen

    def get_edges(self, upstream: Vertex, downstream: Vertex) -> list[Edge]:
        """All parallel edges between a vertex pair."""
        return [
            e for e in self.get_downstream_edges(upstream)
            if e.downstream is downstream
        ]

    def get_root_vertices(self) -> list[Vertex]:
        return [v for v in self._vertices.values()
                if not self._upstream_edges[v._id]]  # type: ignore[index]

    def get_leaf_vertices(self) -> list[Vertex]:
        return [v for v in self._vertices.values()
                if not self._downstream_edges[v._id]]  # type: ignore[index]

    # -- iteration --------------------------------------------------------
    def breadth_first(self) -> Iterator[Vertex]:
        """Kahn-style topological order with breadth-first tie-break.

        Raises :class:`GraphError` on a cyclic graph (either no roots at
        all, or a cycle reachable only through itself).
        """
        if not self._vertices:
            return
        indegree = {vid: len(self._upstream_edges[vid]) for vid in self._vertices}
        queue = [vid for vid, d in indegree.items() if d == 0]
        if not queue:
            raise GraphError("graph has no root vertices (cycle detected)")
        emitted = 0
        while queue:
            vid = queue.pop(0)
            emitted += 1
            yield self._vertices[vid]
            for eid in self._downstream_edges[vid]:
                did = self._edges[eid].downstream._id
                assert did is not None
                indegree[did] -= 1
                if indegree[did] == 0:
                    queue.append(did)
        if emitted != len(self._vertices):
            raise GraphError("cycle detected: not all vertices reachable from roots")

    def __iter__(self) -> Iterator[Vertex]:
        return self.breadth_first()

    # -- serialization ----------------------------------------------------
    def to_dict(self) -> dict:
        """Structural serialization; payload serialization is the node
        layer's job (see :meth:`mldag_spark.core.dag.MLDag.to_dict`).

        Unlike the reference's version this is designed to round-trip
        (the reference's ``from_dict`` is broken on real DAGs — SURVEY §2.2).
        """
        ids = {id(v): i for i, v in enumerate(self._vertices.values())}
        return {
            "vertices": [v.to_dict() if hasattr(v, "to_dict") else {}
                         for v in self._vertices.values()],
            "edges": [
                {"upstream": ids[id(e.upstream)],
                 "downstream": ids[id(e.downstream)],
                 **(e.to_dict() if hasattr(e, "to_dict") else {})}
                for e in self._edges.values()
            ],
        }
