"""Mesh-parallel tests on the 8-device virtual CPU mesh: query DP over a
replicated index and sharded sub-index search with distributed top-k merge
(the TPU-native analogue of the reference's concurrency test,
``graph/src/graph.rs:463-486``)."""

import numpy as np
import jax

from hnsw_rs_tpu import HNSW, FlatIndex
from hnsw_rs_tpu.parallel import ReplicatedHNSW, ShardedHNSW, make_mesh
from hnsw_rs_tpu.utils import gen_rand_vecs

N, DIM, M = 400, 16, 8


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_replicated_dp_matches_single_device():
    vecs = gen_rand_vecs(N, DIM, seed=0)
    index = HNSW(M, dim=DIM)
    index.insert_bulk(vecs)
    queries = gen_rand_vecs(16, DIM, seed=1)
    d1, i1 = index.ann_batch(queries, 5, 40)
    mesh = make_mesh(n_data=8, n_shard=1)
    rep = ReplicatedHNSW(index, mesh)
    d2, i2 = rep.ann_batch(queries, 5, 40)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_sharded_index_recall():
    vecs = gen_rand_vecs(N, DIM, seed=2)
    queries = gen_rand_vecs(16, DIM, seed=3)
    mesh = make_mesh(n_data=2, n_shard=4)
    sharded = ShardedHNSW(M, DIM, n_shards=4, mesh=mesh)
    sharded.insert_bulk(vecs)
    assert len(sharded) == N
    d, ids = sharded.ann_batch(queries, 10, 60)
    # ground truth over the same quantized space
    flat = FlatIndex(DIM)
    flat.add(vecs)
    _, truth = flat.search(queries, 10, exact=True)
    recall = np.mean(
        [len(set(a) & set(b)) / 10.0 for a, b in zip(ids, truth)]
    )
    assert recall > 0.95, f"sharded recall {recall}"
    # distances sorted ascending, global ids valid
    assert np.all(np.diff(d, axis=1) >= 0)
    assert np.all((ids >= 0) & (ids < N))


def test_sharded_self_queries():
    vecs = gen_rand_vecs(N, DIM, seed=4)
    mesh = make_mesh(n_data=1, n_shard=8)
    sharded = ShardedHNSW(M, DIM, n_shards=8, mesh=mesh)
    sharded.insert_bulk(vecs)
    _, ids = sharded.ann_batch(vecs[:64], 1, 40)
    hit = np.mean(ids[:, 0] == np.arange(64))
    assert hit > 0.97, f"sharded self-recall {hit}"

def test_replicated_cosine_matches_single_device():
    # regression: ReplicatedHNSW used to skip cosine query normalization,
    # returning raw-L2 distances instead of the 2-2cos values
    vecs = gen_rand_vecs(N, DIM, seed=7) + 0.5
    index = HNSW(M, dim=DIM, metric="cosine")
    index.insert_bulk(vecs)
    queries = gen_rand_vecs(16, DIM, seed=8) * 3.0  # deliberately unnormalized
    d1, i1 = index.ann_batch(queries, 5, 40)
    rep = ReplicatedHNSW(index, make_mesh(n_data=8, n_shard=1))
    d2, i2 = rep.ann_batch(queries, 5, 40)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)

def test_sharded_rebuild_serves_new_index():
    # regression: the query jit used to reach the stacked arrays through a
    # static `self`, so a second insert_bulk served the STALE executable
    from hnsw_rs_tpu.parallel import ShardedHNSW

    mesh = make_mesh(n_data=1, n_shard=4)
    idx = ShardedHNSW(M, DIM, n_shards=4, mesh=mesh)
    first = gen_rand_vecs(128, DIM, seed=20)
    idx.insert_bulk(first)
    q = first[:8]
    d1, i1 = idx.ann_batch(q, 1, 32)
    np.testing.assert_array_equal(i1[:, 0], np.arange(8))  # self-match
    # rebuild with DIFFERENT vectors; the same queries must now resolve
    # against the new collection (shifted so old self-matches are wrong)
    second = gen_rand_vecs(128, DIM, seed=21) + 2.0
    idx.insert_bulk(second)
    d2, i2 = idx.ann_batch(second[:8], 1, 32)
    np.testing.assert_array_equal(i2[:, 0], np.arange(8))
    assert float(d2[:, 0].max()) < 1e-3  # exact self-match on NEW data
