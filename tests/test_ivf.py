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


def test_ivf_quantized_blocks_match_f32_blocks():
    # default u8 block storage gives IDENTICAL results to f32 blocks
    # (dequantization is exact)
    vecs = gen_rand_vecs(800, 20, seed=5)
    queries = gen_rand_vecs(16, 20, seed=6)
    a = IVFFlatIndex(20, n_lists=16, quantized_blocks=True)
    b = IVFFlatIndex(20, n_lists=16, quantized_blocks=False)
    a.train_add(vecs)
    b.train_add(vecs)
    da, ia = a.search(queries, 8, n_probe=6)
    db, ib = b.search(queries, 8, n_probe=6)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db, rtol=1e-6, atol=1e-6)


def test_ivf_incremental_add_and_full_probe_exact():
    d = 12
    first, second = gen_rand_vecs(600, d, seed=7), gen_rand_vecs(250, d, seed=8)
    queries = gen_rand_vecs(20, d, seed=9)
    ivf = IVFFlatIndex(d, n_lists=16)
    ids0 = ivf.train_add(first)
    ids1 = ivf.add(second)
    assert len(ivf) == 850
    assert ids1[0] == 600 and ids1[-1] == 849  # stable row ids
    flat = FlatIndex(d)
    flat.add(np.concatenate([first, second]))
    _, truth = flat.search(queries, 10, exact=True)
    _, ids = ivf.search(queries, 10, n_probe=16)  # probe all -> exact
    assert recall(ids, truth, 10) == 1.0
    # added points are individually findable
    _, self_ids = ivf.search(second[:32], 1, n_probe=4)
    assert np.mean(self_ids[:, 0] == 600 + np.arange(32)) == 1.0


def test_ivf_add_on_untrained_trains():
    vecs = gen_rand_vecs(300, 8, seed=10)
    ivf = IVFFlatIndex(8, n_lists=8)
    ids = ivf.add(vecs)
    assert len(ivf) == 300 and ids[-1] == 299
    assert ivf.centroids is not None


def test_ivf_retrain_rebalances_lists_after_drift():
    d = 16
    base = gen_rand_vecs(500, d, seed=11)
    drift = gen_rand_vecs(500, d, seed=12) + 4.0  # far-away mode
    queries = drift[:24] + 0.01
    flat = FlatIndex(d)
    flat.add(np.concatenate([base, drift]))
    _, truth = flat.search(queries, 10, exact=True)
    ivf = IVFFlatIndex(d, n_lists=25, n_probe=3)
    ivf.train_add(base)  # centroids know nothing of the drift mode
    ivf.add(drift)       # all drift points pile into a few lists
    lmax_before = int(ivf.blocks.shape[1])
    occ_before = int(ivf._counts.max())
    ivf.retrain()
    # retraining moves centroids into the new mode: max list occupancy
    # shrinks a lot (the padded block width adds <= ~25% add-headroom on
    # top) and recall on the drifted mode stays high at a small probe
    # count
    assert int(ivf._counts.max()) < 0.5 * occ_before
    assert int(ivf.blocks.shape[1]) < 0.6 * lmax_before
    # work comparison: 12 probes x the new (small, headroom-padded) width
    # still beats 3 probes x the old width, and recall is high
    assert 12 * int(ivf.blocks.shape[1]) < 3 * lmax_before
    _, ids_after = ivf.search(queries, 10, n_probe=12)
    assert recall(ids_after, truth, 10) > 0.95


def test_ivf_untrained_search_raises():
    import pytest

    with pytest.raises(ValueError):
        IVFFlatIndex(8).search(gen_rand_vecs(2, 8, seed=13), 3)


def test_ivf_save_load_roundtrip(tmp_path):
    # persistence without re-running k-means: loaded index answers
    # identically (same centroids, same blocks after repack)
    d = 16
    vecs = gen_rand_vecs(700, d, seed=14)
    queries = gen_rand_vecs(24, d, seed=15)
    ivf = IVFFlatIndex(d, n_lists=20, n_probe=5, seed=3)
    ivf.train_add(vecs)
    da, ia = ivf.search(queries, 8)
    ivf.save(str(tmp_path / "ivf"))
    back = IVFFlatIndex.load(str(tmp_path / "ivf"))
    assert len(back) == 700 and back.n_lists == 20 and back.n_probe == 5
    db, ib = back.search(queries, 8)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db, rtol=1e-6, atol=1e-6)
    # the loaded index keeps working incrementally
    more = gen_rand_vecs(50, d, seed=16)
    ids = back.add(more)
    assert ids[0] == 700 and len(back) == 750
    _, self_ids = back.search(more[:16], 1, n_probe=20)
    assert np.mean(self_ids[:, 0] == 700 + np.arange(16)) == 1.0


def test_ivf_add_is_tail_scatter_not_repack():
    # small adds scatter into headroom slots: the shared block width must
    # NOT change, and results stay exact under full probe
    d = 10
    base = gen_rand_vecs(640, d, seed=17)
    ivf = IVFFlatIndex(d, n_lists=16)
    ivf.train_add(base)
    w0 = int(ivf.blocks.shape[1])
    rng = np.random.default_rng(18)
    for i in range(5):
        ivf.add(rng.standard_normal((7, d)).astype(np.float32))
    assert int(ivf.blocks.shape[1]) == w0  # headroom absorbed the adds
    assert len(ivf) == 640 + 35
    # full-probe search is exact over everything stored
    from hnsw_rs_tpu.ops.quant import dequantize

    added = np.asarray(dequantize(ivf.codes[640:675], ivf.scales[640:675]))
    _, self_ids = ivf.search(added, 1, n_probe=16)
    assert np.mean(self_ids[:, 0] == 640 + np.arange(35)) == 1.0


def test_flat_save_load_roundtrip(tmp_path):
    import os

    d = 14
    vecs = gen_rand_vecs(300, d, seed=20)
    queries = gen_rand_vecs(12, d, seed=21)
    for quantized in (True, False):
        flat = FlatIndex(d, quantized=quantized)
        flat.add(vecs)
        da, ia = flat.search(queries, 6)
        flat.save(os.path.join(str(tmp_path), f"flat{quantized}"))
        back = FlatIndex.load(os.path.join(str(tmp_path), f"flat{quantized}"))
        assert back.quantized == quantized and len(back) == 300
        db, ib = back.search(queries, 6)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(da, db, rtol=1e-6, atol=1e-6)


def test_ivf_chunked_kmeans_path(monkeypatch):
    """Past DENSE_KMEANS_LIMIT the coarse quantizer routes through the
    cluster builder's subsampled/chunked kmeans (the dense [N, C] Lloyd
    temp is 32 GB at 1M x 8192 lists — the scale this family publishes
    numbers at, benchmarks/bench_families.py). Forcing the limit to 0
    exercises that path at toy size: full-probe stays exact and partial
    probe stays a working ANN."""
    from hnsw_rs_tpu.models import ivf as ivf_mod

    monkeypatch.setattr(ivf_mod, "DENSE_KMEANS_LIMIT", 0)
    n, d = 2000, 24
    vecs = gen_rand_vecs(n, d, seed=7)
    queries = gen_rand_vecs(32, d, seed=8)
    flat = FlatIndex(d)
    flat.add(vecs)
    _, truth = flat.search(queries, 10, exact=True)
    ivf = IVFFlatIndex(d, n_lists=32, kmeans_iters=8)
    ivf.train_add(vecs)
    _, ids_all = ivf.search(queries, 10, n_probe=32)
    assert recall(ids_all, truth, 10) == 1.0
    _, ids16 = ivf.search(queries, 10, n_probe=16)
    assert recall(ids16, truth, 10) > 0.9
