"""NN-descent refinement (refine.refine_layer / HNSW.refine): row
invariants and recall family. Quality is recall-GATED (the accept chain
itself is oracle-pinned in tests/test_search.py)."""

import numpy as np

import jax.numpy as jnp

from conftest import TEST_DATA  # noqa: F401  (conftest forces CPU)
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.utils import brute_force_nns
from hnsw_rs_tpu.utils.datasets import synthetic_clustered


def test_refine_invariants_and_recall_family():
    n, d, k = 4000, 32, 10
    ds = synthetic_clustered(n, d, n_queries=48, seed=9)
    idx = HNSW(12, dim=d)
    idx.insert_bulk(ds.train, cluster_build=True,
                    cluster_kwargs=dict(points_per_cluster=48, fanout=4,
                                        pool_p=64))
    truth = brute_force_nns(ds.test, idx.points.codes, idx.points.scales, k)
    idx.finalize(pivots=256)
    _, a0 = idx.ann_batch(ds.test, k, 64)
    r0 = np.mean([len(set(a) & set(t)) / k
                  for a, t in zip(a0.tolist(), truth.tolist())])

    idx.refine(rounds=1)
    # serving layouts for layer 0 were invalidated
    assert idx._packed0 is None and idx._pq is None

    adj = np.asarray(idx.graph.get_layer(0))
    rows = np.arange(n)
    assert not np.any(adj == rows[:, None]), "self edge after refine"
    for r in range(0, n, 257):  # spot-check duplicate-free rows
        live = adj[r][adj[r] >= 0]
        assert live.size == np.unique(live).size, f"dup in row {r}"
    assert adj.max() < n and np.all(adj >= -1)
    # orphan repair ran: every node with out-edges has an in-edge
    indeg = np.bincount(adj[adj >= 0], minlength=n)
    outdeg = (adj >= 0).sum(1)
    assert not np.any((outdeg > 0) & (indeg == 0)), "orphan after refine"

    idx.finalize(pivots=256)
    _, a1 = idx.ann_batch(ds.test, k, 64)
    r1 = np.mean([len(set(a) & set(t)) / k
                  for a, t in zip(a1.tolist(), truth.tolist())])
    # same recall family: refinement must not collapse quality (its value
    # shows on regimes the cluster pools mis-serve; here it's ~neutral)
    assert r1 >= r0 - 0.03, (r1, r0)


def test_refine_empty_and_noop():
    idx = HNSW(8, dim=16)
    idx.refine()  # empty index: no-op, no crash
    assert len(idx) == 0
