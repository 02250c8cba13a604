"""IVF-Flat index: recall vs exact, probe sweep monotonicity, full-probe
exactness."""

import numpy as np

from hnsw_rs_tpu import FlatIndex
from hnsw_rs_tpu.models.ivf import IVFFlatIndex
from hnsw_rs_tpu.utils import gen_rand_vecs


def recall(ids, truth, k):
    return np.mean([len(set(a[:k]) & set(t[:k])) / k for a, t in zip(ids, truth)])


def test_ivf_recall_and_probe_monotonicity():
    n, d = 2000, 24
    vecs = gen_rand_vecs(n, d, seed=0)
    queries = gen_rand_vecs(32, d, seed=1)
    flat = FlatIndex(d)
    flat.add(vecs)
    _, truth = flat.search(queries, 10, exact=True)

    ivf = IVFFlatIndex(d, n_lists=32, kmeans_iters=8)
    ivf.train_add(vecs)
    assert len(ivf) == n
    r = {}
    for p in (1, 4, 16, 32):
        _, ids = ivf.search(queries, 10, n_probe=p)
        r[p] = recall(ids, truth, 10)
    assert r[32] == 1.0  # probing every list == exact search
    assert r[16] >= r[4] >= r[1] - 1e-9
    assert r[16] > 0.9


def test_ivf_self_queries():
    n, d = 500, 16
    vecs = gen_rand_vecs(n, d, seed=2)
    ivf = IVFFlatIndex(d, n_lists=16, n_probe=4)
    ivf.train_add(vecs)
    _, ids = ivf.search(vecs[:64], 1)
    # a point's own list is always probed first
    assert np.mean(ids[:, 0] == np.arange(64)) == 1.0


def test_ivf_distances_sorted():
    vecs = gen_rand_vecs(300, 8, seed=3)
    ivf = IVFFlatIndex(8, n_lists=8)
    ivf.train_add(vecs)
    d, i = ivf.search(gen_rand_vecs(5, 8, seed=4), 7)
    assert np.all(np.diff(d, axis=1) >= 0)
    assert np.all((i >= 0) & (i < 300))
