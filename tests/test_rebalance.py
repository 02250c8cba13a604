"""ShardedHNSW.rebalance: point movement between shards.

Skewed partitions (``insert_bulk(partition_bounds=...)``) are evened out
by moving tail rows: global ids survive, recall holds, counts converge,
and incremental add / seeded serving keep working afterwards."""

import numpy as np

from hnsw_rs_tpu import FlatIndex
from hnsw_rs_tpu.parallel import ShardedHNSW, make_mesh

from hnsw_rs_tpu.utils import gen_rand_vecs

N, DIM, M = 480, 16, 8
BOUNDS = [0, 300, 400, 450, N]  # counts 300/100/50/30 — heavy skew


def recall(ids, truth):
    return np.mean([len(set(a) & set(t)) / len(t) for a, t in zip(ids, truth)])


def _skewed_index():
    vecs = gen_rand_vecs(N, DIM, seed=7)
    idx = ShardedHNSW(M, DIM, n_shards=4, mesh=make_mesh(1, 4))
    idx.insert_bulk(vecs, concurrent=False, partition_bounds=BOUNDS)
    return vecs, idx


def test_rebalance_moves_points_and_keeps_recall():
    vecs, idx = _skewed_index()
    queries = gen_rand_vecs(24, DIM, seed=8)
    flat = FlatIndex(DIM)
    flat.add(vecs)
    _, truth = flat.search(queries, 10, exact=True)

    assert idx._counts.tolist() == [300, 100, 50, 30]
    _, ids_before = idx.ann_batch(queries, 10, 60)
    r_before = recall(ids_before, truth)

    moved = idx.rebalance()
    assert moved == 180  # 300 -> 120, every other shard topped up to 120
    assert idx._counts.tolist() == [120, 120, 120, 120]
    assert len(idx) == N

    # the id space is untouched: every original gid still lives somewhere
    gids = np.asarray(idx._stacked["gids"])
    alive = np.sort(gids[gids >= 0])
    np.testing.assert_array_equal(alive, np.arange(N))
    # alive rows are dense [0, counts) per shard, dead rows cleared
    for s in range(4):
        assert np.all(gids[s, :120] >= 0) and np.all(gids[s, 120:] == -1)
        assert np.all(idx._levels[s, :120] >= 0)
        assert np.all(idx._levels[s, 120:] == -1)

    _, ids_after = idx.ann_batch(queries, 10, 60)
    r_after = recall(ids_after, truth)
    assert r_after >= r_before - 0.03, f"{r_after} vs {r_before}"
    assert np.all((ids_after >= 0) & (ids_after < N))

    # no stray edges into dead rows at any layer
    for a in idx._stacked["adjs"]:
        a = np.asarray(a)
        for s in range(4):
            tgt = a[s][a[s] >= 0]
            assert tgt.size == 0 or int(tgt.max()) < 120


def test_rebalance_noop_when_balanced():
    vecs = gen_rand_vecs(N, DIM, seed=9)
    idx = ShardedHNSW(M, DIM, n_shards=4, mesh=make_mesh(1, 4))
    idx.insert_bulk(vecs, concurrent=False)
    before = idx._counts.copy()
    assert idx.rebalance() == 0
    np.testing.assert_array_equal(idx._counts, before)


def test_rebalance_then_add_and_seeded_serving():
    vecs, idx = _skewed_index()
    idx.rebalance()

    # incremental add continues the gid space from N
    extra = gen_rand_vecs(32, DIM, seed=10)
    new_gids = idx.add(extra)
    np.testing.assert_array_equal(new_gids, N + np.arange(32))
    assert len(idx) == N + 32

    # seeded serving composes on the rebalanced index; the moved points
    # remain findable by their own vectors
    idx.finalize(pivots=64)
    _, ids = idx.ann_batch(vecs[280:320], 1, 48)
    hit = np.mean(ids[:, 0] == (280 + np.arange(40)))
    assert hit > 0.9, f"self-match after rebalance {hit}"
    _, ids_new = idx.ann_batch(extra, 1, 48)
    assert np.mean(ids_new[:, 0] == new_gids) > 0.9
