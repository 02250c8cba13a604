"""Parity odds and ends: FullVec-mode flat index, isolate_node, random
graph factory, PointStore.push."""

import numpy as np
import pytest

from hnsw_rs_tpu import FlatIndex, PointStore
from hnsw_rs_tpu.graphs import LayeredGraph
from hnsw_rs_tpu.utils import gen_rand_vecs


def test_flat_unquantized_exact_f32():
    # FullVec parity: no quantization error at all
    store = gen_rand_vecs(200, 16, seed=0)
    idx = FlatIndex(16, quantized=False)
    idx.add(store)
    d, i = idx.search(store[:10], 1, exact=True)
    np.testing.assert_array_equal(i[:, 0], np.arange(10))
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)
    # exact f32 distances, not quantized ones
    two = FlatIndex(16, quantized=False)
    two.add(store[:2])
    want = np.sqrt(np.sum((store[0] - store[1]) ** 2))
    d2, i2 = two.search(store[0], 2, exact=True)
    np.testing.assert_allclose(d2[0][i2[0] == 1][0], want, rtol=1e-6)


def test_isolate_node_protects_last_edge():
    g = LayeredGraph(m=4, n=4)
    g.ensure_level(0)
    g.add_edge(0, 0, 1)
    g.add_edge(0, 0, 2)
    g.add_edge(0, 2, 3)
    # node 1's only edge is to 0 -> must be kept; 2 has another edge
    g.isolate_node(0, 0)
    assert set(g.neighbors(0, 0)) == {1}
    assert set(g.neighbors(0, 2)) == {3}


def test_make_rand_graph():
    g = LayeredGraph.make_rand(30, m=4, n_edges=40, seed=1)
    degs = [g.degree(0, i) for i in range(30)]
    assert sum(degs) == 80  # undirected: every edge counted twice
    assert max(degs) <= g.layer_cap(0)


def test_point_store_push():
    ps = PointStore.empty(8)
    v = gen_rand_vecs(1, 8, seed=2)[0]
    pid = ps.push(v, level=2)
    assert pid == 0 and len(ps) == 1
    assert ps.levels[0] == 2
    np.testing.assert_allclose(ps.get_values(0), v, atol=0.01)
    pid2 = ps.push(v * 2, level=0)
    assert pid2 == 1 and len(ps) == 2

def test_add_edge_m_exceeded():
    from hnsw_rs_tpu.errors import MExceeded

    g = LayeredGraph(m=1, n=4)  # layer 0 cap = 2
    g.ensure_level(0)
    g.add_edge(0, 0, 1)
    g.add_edge(0, 0, 2)
    g.add_edge(0, 0, 1)  # idempotent re-add of an existing edge is fine
    with pytest.raises(MExceeded):
        g.add_edge(0, 0, 3)  # node 0's row is full
    with pytest.raises(MExceeded):
        g.add_edge(0, 3, 0)  # full endpoint on the other side
    assert set(g.neighbors(0, 0)) == {1, 2}


def test_isolate_node_strict_raises():
    from hnsw_rs_tpu.errors import IsolatedNode

    g = LayeredGraph(m=4, n=4)
    g.ensure_level(0)
    g.add_edge(0, 0, 1)  # node 1's only edge
    g.add_edge(0, 0, 2)
    g.add_edge(0, 2, 3)
    with pytest.raises(IsolatedNode):
        g.isolate_node(0, 0, strict=True)
    # default (reference semantics, graph/src/graph.rs:85-94) still skips
    g.isolate_node(0, 0)
    assert set(g.neighbors(0, 0)) == {1}
