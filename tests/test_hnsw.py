"""Index integration tests (mirroring ``hnsw/src/template.rs:447-611``):
init, build, insert-after-build, double bulk build, dim-mismatch raise,
save/load round-trip, and graph invariants."""

import numpy as np
import pytest

from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.errors import DimensionMismatch
from hnsw_rs_tpu.utils import gen_rand_vecs

DIM = 10
N = 100
M = 12


def test_hnsw_init():
    HNSW(12, dim=128)


def test_hnsw_build():
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=0))
    assert len(index) == N
    assert index.assert_param_compliance(verbose=True)


def test_hnsw_insert_one_after_build():
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=1))
    index.insert_vec(gen_rand_vecs(1, DIM, seed=2)[0])
    assert len(index) == N + 1
    # the new point must be reachable
    v = index.get_point(N).values
    ids = index.ann_by_vector(v, 1, 50)
    assert int(ids[0]) == N


def test_hnsw_insert_many_after_build():
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=3))
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=4))
    assert len(index) == 2 * N
    assert index.assert_param_compliance(verbose=False)


def test_can_not_add_different_dim():
    index = HNSW(12, dim=128)
    index.insert_bulk(gen_rand_vecs(10, 128, seed=5))
    with pytest.raises(DimensionMismatch):
        index.insert_bulk(gen_rand_vecs(10, 512, seed=6))


def test_insert_from_empty_incrementally():
    index = HNSW(8, dim=DIM)
    vecs = gen_rand_vecs(20, DIM, seed=7)
    for v in vecs:
        index.insert_vec(v)
    assert len(index) == 20
    # every point should find itself as its own nearest neighbor
    for i in (0, 7, 19):
        ids = index.ann_by_vector(vecs[i], 1, 30)
        got = index.get_point(int(ids[0])).values
        want = index.get_point(i).values
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_query_self_recall():
    # every stored point's nearest neighbor (itself) must be found
    index = HNSW(M, dim=DIM)
    vecs = gen_rand_vecs(N, DIM, seed=8)
    index.insert_bulk(vecs)
    _, ids = index.ann_batch(vecs, 1, ef=30)
    hit = np.mean(ids[:, 0] == np.arange(N))
    assert hit > 0.97, f"self-recall {hit}"


def test_save_load_roundtrip(tmp_path):
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=9))
    p = str(tmp_path / "idx")
    index.save(p)
    loaded = HNSW.load(p)
    assert len(loaded) == N
    assert loaded.params.to_dict() == index.params.to_dict()
    for i in range(0, N, 7):
        np.testing.assert_array_equal(
            np.asarray(loaded.graph.get_layer(0)[i]),
            np.asarray(index.graph.get_layer(0)[i]),
        )
        np.testing.assert_array_equal(
            loaded.get_point(i).values, index.get_point(i).values
        )
    # loaded index answers queries identically
    q = gen_rand_vecs(5, DIM, seed=10)
    np.testing.assert_array_equal(
        index.ann_batch(q, 5, 40)[1], loaded.ann_batch(q, 5, 40)[1]
    )


def test_degrees_and_print(capsys):
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=11))
    degs = index.layer_degrees(0)
    assert degs.shape[0] == N
    assert np.all(degs >= 1) and np.all(degs <= index.params.mmax0)
    index.print_index()
    out = capsys.readouterr().out
    assert f"Nb. of points = {N}" in out

def test_load_then_insert(tmp_path):
    # regression: load() used to leave the graph's in-degree caches empty,
    # making any post-load insert raise (or silently corrupt the graph)
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=11))
    p = str(tmp_path / "idx")
    index.save(p)
    loaded = HNSW.load(p)
    new_id = loaded.insert_vec(gen_rand_vecs(1, DIM, seed=12)[0])
    assert new_id == N
    loaded.insert_bulk(gen_rand_vecs(20, DIM, seed=13))
    assert len(loaded) == N + 21
    assert loaded.assert_param_compliance(verbose=True)
    # the post-load inserts are reachable
    v = loaded.get_point(new_id).values
    ids = loaded.ann_by_vector(v, 1, 50)
    assert int(ids[0]) == new_id

def test_insert_vec_batching():
    # insert_vec buffers host-side and flushes as one wave on read
    index = HNSW(M, dim=DIM)
    index.insert_bulk(gen_rand_vecs(N, DIM, seed=30))
    vs = gen_rand_vecs(60, DIM, seed=31)
    ids = [index.insert_vec(v) for v in vs]
    assert ids == list(range(N, N + 60))
    assert len(index) == N + 60
    assert len(index.points) == N  # nothing applied yet (buffered)
    # a query flushes and the new points are immediately searchable
    got = index.ann_by_vector(vs[-1], 1, 50)
    assert int(got[0]) == N + 59
    assert len(index.points) == N + 60
    assert index.assert_param_compliance(verbose=True)
    # get_point of a pending id flushes too
    nid = index.insert_vec(gen_rand_vecs(1, DIM, seed=32)[0])
    p = index.get_point(nid)
    assert p is not None and p.id == nid
    # threshold flush
    index.pending_flush_size = 4
    for v in gen_rand_vecs(4, DIM, seed=33):
        index.insert_vec(v)
    assert not index._pending


def test_insert_vec_from_empty_buffered():
    index = HNSW(M, dim=DIM)
    vs = gen_rand_vecs(20, DIM, seed=34)
    for v in vs:
        index.insert_vec(v)
    assert len(index) == 20
    got = index.ann_by_vector(vs[3], 1, 50)
    assert int(got[0]) == 3

def test_hub_node_reverse_edge_overflow():
    # adversarial hub: one existing point at the center, then a single
    # large wave of points in a tight shell around it — nearly every wave
    # node selects the hub, overflowing the 2*cap reverse-edge slots in
    # _apply_wave (build.py). The contract: degree caps hold, nothing is
    # orphaned, and every point stays reachable.
    rng = np.random.default_rng(70)
    dim, nw = 8, 500
    center = np.full((1, dim), 0.5, np.float32)
    shell = rng.normal(0, 1, (nw, dim)).astype(np.float32)
    shell /= np.linalg.norm(shell, axis=1, keepdims=True)
    shell = center + 0.05 * shell  # tight shell: hub is everyone's nearest
    index = HNSW(8, dim=dim)
    index.insert_bulk(center)
    # one wave, no ramp: maximum same-target pressure
    index.insert_bulk(shell, wave_base=nw, wave_cap=nw)
    assert index.assert_param_compliance(verbose=True)
    # the hub kept only its cap nearest, but every shell point must
    # still be findable (reverse-overflow must not shed reachability)
    qs = shell[::7]
    _, ids = index.ann_batch(qs, 1, 64)
    hits = np.mean(ids[:, 0] == 1 + np.arange(0, nw, 7))
    assert hits >= 0.97, f"self-match {hits}"
    # and the hub itself resolves
    assert int(index.ann_by_vector(center[0], 1, 64)[0]) == 0


def test_build_expand_quality_holds():
    # E>1 construction-search pops: quality within a point of E=1 and the
    # index stays param-compliant (superset-discovery argument in
    # search._beam_loop)
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.utils import brute_force_nns, gen_rand_vecs

    vecs = gen_rand_vecs(1500, 32, seed=31)
    queries = gen_rand_vecs(64, 32, seed=32)

    def build(e):
        idx = HNSW(12, ef_cons=48, dim=32)
        idx.insert_bulk(vecs, build_expand=e)
        return idx

    i1, i2 = build(1), build(2)
    assert i2.assert_param_compliance(verbose=False)
    truth = brute_force_nns(queries, i1.points.codes, i1.points.scales, 10)
    rec = []
    for idx in (i1, i2):
        _, ids = idx.ann_batch(queries, 10, 64)
        rec.append(
            np.mean([len(set(a) & set(t)) / 10 for a, t in zip(ids, truth)])
        )
    assert rec[1] >= rec[0] - 0.015, rec
    assert rec[1] > 0.95, rec


def test_packed_build_is_bit_identical_to_plain():
    # the packed-row construction path (build.PACKED_BUILD_LIMIT gate)
    # must produce EXACTLY the graph of the plain path: same searches,
    # same heuristic pools, same applies — only the gather layout differs.
    # Also the incrementally-maintained table must equal a fresh
    # pack_layer of the final adjacency (the serving-pack-for-free claim).
    import jax.numpy as jnp

    from hnsw_rs_tpu.search import pack_layer

    rng = np.random.default_rng(123)
    v = rng.standard_normal((600, 16)).astype(np.float32)
    a = HNSW(8, ef_cons=32, dim=16)
    a.insert_bulk(v)  # auto: packed (table is tiny)
    assert a._packed0 is not None and a._packed_n == len(a)
    b = HNSW(8, ef_cons=32, dim=16)
    b.insert_bulk(v, packed_build=False)
    assert b._packed0 is None
    assert len(a.graph) == len(b.graph)
    for la, lb in zip(a.graph.adjs, b.graph.adjs):
        assert bool(jnp.array_equal(la, lb))
    fresh = pack_layer(b.graph.get_layer(0), b.points.codes, b.points.scales)
    assert bool(jnp.array_equal(a._packed0, fresh))


def test_packed_build_lag_mode_fresh_at_end():
    # deferred-repack mode (pack_lag>1): rows may serve stale DURING the
    # build, but layer boundaries force a refresh, so the final table
    # always equals pack_layer(final adjacency) and the index quality
    # stays in family with the exact mode.
    import jax.numpy as jnp

    from hnsw_rs_tpu.search import pack_layer

    rng = np.random.default_rng(321)
    v = rng.standard_normal((700, 16)).astype(np.float32)
    a = HNSW(8, ef_cons=32, dim=16)
    a.insert_bulk(v, pack_lag=4)
    assert a._packed0 is not None
    fresh = pack_layer(a.graph.get_layer(0), a.points.codes, a.points.scales)
    assert bool(jnp.array_equal(a._packed0, fresh))
    _, ids = a.ann_batch(v[:64], 1, 32)
    assert float(np.mean(ids[:, 0] == np.arange(64))) > 0.95


def test_build_seeded_quality_in_family():
    # seeded construction (build_seeded=True): layer-0 searches start
    # from the level>=1 pivot skeleton. The graph differs from the
    # descent-entry build, but quality stays in family even with a much
    # tighter iteration cap.
    rng = np.random.default_rng(99)
    v = rng.standard_normal((1200, 24)).astype(np.float32)
    q = rng.standard_normal((48, 24)).astype(np.float32)

    from hnsw_rs_tpu import FlatIndex

    flat = FlatIndex(24)
    flat.add(v)
    _, truth = flat.search(q, 10, exact=True)

    base = HNSW(8, ef_cons=48, dim=24)
    base.insert_bulk(v)
    seeded = HNSW(8, ef_cons=48, dim=24)
    seeded.insert_bulk(v, build_seeded=True, max_iters=64)

    def rec(idx):
        _, ids = idx.ann_batch(q, 10, 64)
        return np.mean([len(set(a) & set(t)) / 10 for a, t in zip(ids, truth)])

    r_base, r_seeded = rec(base), rec(seeded)
    assert r_seeded >= r_base - 0.03, (r_seeded, r_base)
    assert seeded.assert_param_compliance(verbose=False)
