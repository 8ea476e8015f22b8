"""Graph invariant tests (parity model: reference tests/test_graph.py)."""

import pytest

from mldag_spark import Edge, Graph, GraphError, Vertex


def test_add_vertex_and_membership():
    g = Graph()
    v = Vertex()
    g.add_vertex(v)
    assert v.graph is g
    assert g.vertices == [v]
    # re-adding is a no-op
    g.add_vertex(v)
    assert len(g.vertices) == 1


def test_vertex_single_graph_membership():
    g1, g2 = Graph(), Graph()
    v = Vertex()
    g1.add_vertex(v)
    with pytest.raises(GraphError):
        g2.add_vertex(v)


def test_cross_graph_edge_rejected():
    g1, g2 = Graph(), Graph()
    a, b = Vertex(), Vertex()
    g1.add_vertex(a)
    g2.add_vertex(b)
    with pytest.raises(GraphError):
        g1.connect(a, b)


def test_connect_two_unattached_raises():
    a, b = Vertex(), Vertex()
    with pytest.raises(GraphError):
        a._resolve_common_graph(b)


def test_membership_propagates_from_attached_side():
    g = Graph()
    a, b = Vertex(), Vertex()
    g.add_vertex(a)
    assert a._resolve_common_graph(b) is g
    assert b.graph is g


def test_parallel_edges_allowed():
    g = Graph()
    a, b = Vertex(), Vertex()
    g.connect(a, b)
    g.connect(a, b)
    assert len(g.get_edges(a, b)) == 2


def test_roots_and_leaves():
    g = Graph()
    a, b, c = Vertex(), Vertex(), Vertex()
    g.connect(a, b)
    g.connect(b, c)
    assert g.get_root_vertices() == [a]
    assert g.get_leaf_vertices() == [c]


def test_adjacency_queries():
    g = Graph()
    a, b, c = Vertex(), Vertex(), Vertex()
    g.connect(a, b)
    g.connect(a, c)
    assert g.get_downstream_vertices(a) == [b, c]
    assert g.get_upstream_vertices(c) == [a]
    assert len(g.get_downstream_edges(a)) == 2


def test_bfs_topological_order_diamond():
    g = Graph()
    a, b, c, d = (Vertex() for _ in range(4))
    g.connect(a, b)
    g.connect(a, c)
    g.connect(b, d)
    g.connect(c, d)
    order = list(g)
    assert order.index(a) < order.index(b) < order.index(d)
    assert order.index(a) < order.index(c) < order.index(d)


def test_cycle_detection_no_roots():
    g = Graph()
    a, b = Vertex(), Vertex()
    g.connect(a, b)
    g.connect(b, a)
    with pytest.raises(GraphError):
        list(g)


def test_remove_edge_and_vertex_bookkeeping():
    g = Graph()
    a, b = Vertex(), Vertex()
    e = g.connect(a, b)
    g.remove_edge(e)
    assert g.edges == []
    assert g.get_downstream_edges(a) == []
    g.remove_vertex(a)
    assert a.graph is None
    assert g.vertices == [b]


def test_remove_vertex_drops_incident_edges():
    g = Graph()
    a, b, c = Vertex(), Vertex(), Vertex()
    g.connect(a, b)
    g.connect(b, c)
    g.remove_vertex(b)
    assert g.edges == []
    assert set(g.vertices) == {a, c}
