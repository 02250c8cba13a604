"""Cosine/angular metric support across index families (cosine = L2 over
unit vectors; GloVe-angular is the standard ANN benchmark setting)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_rs_tpu import HNSW, FlatIndex
from hnsw_rs_tpu.models.ivf import IVFFlatIndex
from hnsw_rs_tpu.ops import dequantize, normalize, quantize
from hnsw_rs_tpu.utils import gen_rand_vecs


def cosine_oracle(queries, store, k):
    """Exact top-k by cosine similarity in the quantized-normalized space
    (ties by id), pure numpy."""
    def prep(x):
        xn = np.asarray(normalize(jnp.asarray(x)))
        return np.asarray(dequantize(*quantize(jnp.asarray(xn))))

    qs, xs = prep(queries), prep(store)
    d2 = np.sum((qs[:, None, :] - xs[None, :, :]) ** 2, axis=-1)
    order = np.lexsort(
        (np.broadcast_to(np.arange(store.shape[0]), d2.shape), d2), axis=-1
    )
    return order[:, :k]


def test_flat_cosine_matches_oracle():
    store = gen_rand_vecs(400, 24, seed=0) - 0.5
    queries = gen_rand_vecs(16, 24, seed=1) - 0.5
    idx = FlatIndex(24, metric="cosine")
    idx.add(store)
    _, got = idx.search(queries, 10, exact=True)
    np.testing.assert_array_equal(got, cosine_oracle(queries, store, 10))


def test_cosine_scale_invariance():
    store = gen_rand_vecs(200, 16, seed=2) - 0.5
    q = store[3]
    idx = FlatIndex(16, metric="cosine")
    idx.add(store)
    _, i1 = idx.search(q, 5)
    _, i2 = idx.search(q * 37.0, 5)  # scaling must not change cosine order
    np.testing.assert_array_equal(i1, i2)
    assert i1[0, 0] == 3


def test_hnsw_cosine_recall():
    store = gen_rand_vecs(500, 20, seed=3) - 0.5
    queries = gen_rand_vecs(30, 20, seed=4) - 0.5
    index = HNSW(12, dim=20, metric="cosine")
    index.insert_bulk(store)
    truth = cosine_oracle(queries, store, 10)
    _, ann = index.ann_batch(queries, 10, ef=80)
    recall = np.mean([len(set(a) & set(t)) / 10 for a, t in zip(ann, truth)])
    assert recall > 0.95, recall


def test_hnsw_cosine_persists(tmp_path):
    index = HNSW(8, dim=12, metric="cosine")
    index.insert_bulk(gen_rand_vecs(100, 12, seed=5))
    p = str(tmp_path / "idx")
    index.save(p)
    loaded = HNSW.load(p)
    assert loaded.params.metric == "cosine"


def test_ivf_cosine():
    store = gen_rand_vecs(600, 16, seed=6) - 0.5
    queries = gen_rand_vecs(16, 16, seed=7) - 0.5
    ivf = IVFFlatIndex(16, n_lists=12, metric="cosine")
    ivf.train_add(store)
    truth = cosine_oracle(queries, store, 10)
    _, ids = ivf.search(queries, 10, n_probe=12)  # all lists -> exact
    np.testing.assert_array_equal(ids, truth)


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        FlatIndex(8, metric="dot")
    with pytest.raises(ValueError):
        HNSW(8, dim=8, metric="ip")
