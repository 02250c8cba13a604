"""Paged block store: codec round-trip, arithmetic id lookup, LRU cache,
and out-of-core streaming exact search vs the in-memory oracle (completes
the reference's WIP disk path, ``hnsw/src/disk.rs`` /
``points/src/points/block_points.rs``)."""

import numpy as np
import jax.numpy as jnp

from hnsw_rs_tpu.ops import dequantize, quantize
from hnsw_rs_tpu.store import PointStore, sample_levels
from hnsw_rs_tpu.store_paged import MAX_PER_BLOCK, BlockStore, write_block_store
from hnsw_rs_tpu.utils import brute_force_nns, gen_rand_vecs


def make_store(tmp_path, n=100, d=16, seed=0):
    vecs = gen_rand_vecs(n, d, seed=seed)
    codes, scales = (np.asarray(x) for x in quantize(jnp.asarray(vecs)))
    levels = sample_levels(n, 0.4, seed=seed)
    path = str(tmp_path / "store.blocks")
    write_block_store(path, codes, scales, levels)
    return path, codes, scales, levels


def test_roundtrip_every_point(tmp_path):
    path, codes, scales, levels = make_store(tmp_path, n=77)  # ragged last block
    bs = BlockStore(path, cache_blocks=2)
    assert len(bs) == 77
    assert bs.nb_blocks == -(-77 // MAX_PER_BLOCK)
    for i in range(77):
        c, s, lv = bs.get_point(i)
        np.testing.assert_array_equal(c, codes[i])
        np.testing.assert_allclose(s, scales[i])
        assert lv == levels[i]
    assert bs.get_point(77) is None
    # dequantized value accuracy (block/data.rs:107-108 asserts <5%; ours
    # is bit-exact because min/delta are stored verbatim)
    want = np.asarray(dequantize(jnp.asarray(codes[5]), jnp.asarray(scales[5])))
    np.testing.assert_allclose(bs.get_values(5), want, rtol=1e-6)


def test_chunk_iteration_covers_all(tmp_path):
    path, codes, _, _ = make_store(tmp_path, n=200)
    bs = BlockStore(path)
    seen = 0
    for c, s, start in bs.iter_chunks(chunk_blocks=3):
        assert start == seen
        np.testing.assert_array_equal(c, codes[seen : seen + c.shape[0]])
        seen += c.shape[0]
    assert seen == 200


def test_streaming_search_matches_in_memory(tmp_path):
    n, d = 300, 12
    vecs = gen_rand_vecs(n, d, seed=3)
    codes, scales = quantize(jnp.asarray(vecs))
    path = str(tmp_path / "s.blocks")
    write_block_store(path, np.asarray(codes), np.asarray(scales), np.zeros(n, np.int32))
    bs = BlockStore(path)
    queries = gen_rand_vecs(9, d, seed=4)
    _, got = bs.search_streaming(queries, 10, chunk_blocks=2)
    expect = brute_force_nns(queries, codes, scales, 10)
    np.testing.assert_array_equal(got, expect)


def test_paged_hnsw_recall_parity(tmp_path):
    # out-of-core HNSW serving: identical beam semantics paged from disk
    # must reproduce the in-memory index's answers
    import numpy as np
    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models import PagedHNSW, save_paged
    from hnsw_rs_tpu.utils import gen_rand_vecs

    vecs = gen_rand_vecs(500, 20, seed=50)
    q = gen_rand_vecs(24, 20, seed=51)
    index = HNSW(8, dim=20)
    index.insert_bulk(vecs)
    d_mem, i_mem = index.ann_batch(q, 10, 40)
    p = str(tmp_path / "paged_idx")
    save_paged(index, p)
    paged = PagedHNSW(p, cache_blocks=4)  # tiny cache: force real paging
    d_pg, i_pg = paged.ann_batch(q, 10, 40)
    assert len(paged) == 500
    np.testing.assert_array_equal(i_mem, i_pg)
    np.testing.assert_allclose(d_mem, d_pg, rtol=1e-5)
    # single-vector API + self-match through the paged path
    got = paged.ann_by_vector(vecs[7], 1, 40)
    assert int(got[0]) == 7


def test_hybrid_paged_matches_in_memory_seeded(tmp_path):
    # device hot-tier + paged cold-tier serving returns EXACTLY what the
    # in-memory packed + pivot-seeded index returns (same pivot rule,
    # same beam semantics) — the hot tier only changes where rows come
    # from. Run twice: tiny hot budget (forces cold staging) and full.
    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.paged import HybridPagedHNSW, save_paged

    n, d = 900, 16
    vecs = gen_rand_vecs(n, d, seed=31)
    queries = gen_rand_vecs(24, d, seed=32)
    index = HNSW(8, ef_cons=32, dim=d)
    index.insert_bulk(vecs)
    index.finalize(pivots=4096)  # > level-1 count: both pick all level>=1
    d_mem, i_mem = index.ann_batch(queries, 10, 48)

    path = str(tmp_path / "hyb")
    save_paged(index, path)
    wrow = index.graph.get_layer(0).shape[1] * (d + 12)

    hot_all = HybridPagedHNSW(path, hot_bytes=n * wrow, pivots=4096)
    d_a, i_a = hot_all.ann_batch(queries, 10, 48)
    assert hot_all.misses == 0 and hot_all.hits > 0
    np.testing.assert_array_equal(i_a, i_mem)
    np.testing.assert_allclose(d_a, d_mem, rtol=1e-5, atol=1e-5)

    hot_tiny = HybridPagedHNSW(path, hot_bytes=(n // 10) * wrow, pivots=4096)
    assert hot_tiny.hot_rows <= n // 10
    d_t, i_t = hot_tiny.ann_batch(queries, 10, 48)
    assert hot_tiny.misses > 0  # cold rows actually paged
    np.testing.assert_array_equal(i_t, i_mem)
    np.testing.assert_allclose(d_t, d_mem, rtol=1e-5, atol=1e-5)


def test_hybrid_pq_tier_recall_and_zero_staging(tmp_path):
    # PQ-tier mode (pq_m>0): the whole beam runs on-device over PQ-packed
    # rows (search.pq_beam), exact vectors are paged from disk once per
    # batch for the rerank. Approximate beam + exact rerank: gate recall
    # vs exact truth, and pin that NO per-iteration staging ran.
    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.paged import HybridPagedHNSW, save_paged
    from hnsw_rs_tpu.ops.quant import dequantize, quantize

    n, d, k = 900, 16, 10
    vecs = gen_rand_vecs(n, d, seed=31)
    queries = gen_rand_vecs(24, d, seed=32)
    index = HNSW(8, ef_cons=32, dim=d)
    index.insert_bulk(vecs)
    index.finalize(pivots=4096)
    path = str(tmp_path / "hyb_pq")
    save_paged(index, path)

    qc, qs = quantize(jnp.asarray(queries))
    qdq = np.asarray(dequantize(qc, qs))
    cdq = np.asarray(dequantize(jnp.asarray(index.points.codes[:n]),
                                jnp.asarray(index.points.scales[:n])))
    truth = np.argsort(
        ((cdq[None, :, :] - qdq[:, None, :]) ** 2).sum(-1), axis=1
    )[:, :k]

    hyb = HybridPagedHNSW(path, pivots=4096, pq_m=4, pq_bits=4)
    assert hyb.device_bytes < n * (d + 12) * index.graph.get_layer(0).shape[1]
    d_pq, i_pq = hyb.ann_batch(queries, k, 48)
    assert hyb.misses == 0 and hyb.hits == 0  # no hot/cold staging path
    rec = np.mean([len(set(a) & set(t)) / k for a, t in zip(i_pq, truth)])
    assert rec >= 0.9, f"pq-tier recall {rec}"
    # distances are exact reranked ones
    row = np.asarray(i_pq[0])
    want = np.sqrt(((cdq[row] - qdq[0][None]) ** 2).sum(-1))
    np.testing.assert_allclose(d_pq[0], want, rtol=1e-4, atol=1e-4)
    # 8-bit path serves too
    hyb8 = HybridPagedHNSW(path, pivots=4096, pq_m=8, pq_bits=8)
    _, i8 = hyb8.ann_batch(queries, k, 48)
    rec8 = np.mean([len(set(a) & set(t)) / k for a, t in zip(i8, truth)])
    assert rec8 >= 0.9, f"pq8-tier recall {rec8}"


def test_hybrid_expand_e_fewer_dispatches_equal_recall(tmp_path):
    # expand_e>1 pops E beam entries per device round-trip
    # (search._beam_loop body_e semantics): the discovered set is a
    # superset of an E=1 prefix, so recall vs exact truth cannot drop,
    # and dispatches/batch must shrink ~E-fold.
    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.paged import HybridPagedHNSW, save_paged
    from hnsw_rs_tpu.utils import brute_force_nns as _bf

    n, d, k = 900, 16, 10
    vecs = gen_rand_vecs(n, d, seed=31)
    queries = gen_rand_vecs(24, d, seed=32)
    index = HNSW(8, ef_cons=32, dim=d)
    index.insert_bulk(vecs)
    index.finalize(pivots=4096)
    path = str(tmp_path / "hyb_e")
    save_paged(index, path)
    wrow = index.graph.get_layer(0).shape[1] * (d + 12)
    hyb = HybridPagedHNSW(path, hot_bytes=(n // 10) * wrow, pivots=4096)

    # quantized-space exact truth (what the index can at best return)
    qc, qs = quantize(jnp.asarray(queries))
    qdq = np.asarray(dequantize(qc, qs))
    cdq = np.asarray(dequantize(jnp.asarray(index.points.codes[:n]),
                                jnp.asarray(index.points.scales[:n])))
    truth = np.argsort(
        ((cdq[None, :, :] - qdq[:, None, :]) ** 2).sum(-1), axis=1
    )[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(t)) / k for a, t in zip(ids, truth)])

    _, i1 = hyb.ann_batch(queries, k, 48, expand_e=1)
    disp1 = hyb.dispatches
    _, i4 = hyb.ann_batch(queries, k, 48, expand_e=4)
    disp4 = hyb.dispatches
    assert disp4 < disp1 / 2
    assert recall(i4) >= recall(i1) - 1e-9

    # speculative prefetch only warms caches: results are bit-identical
    # and the lookahead rows actually get served from the row cache
    pf = HybridPagedHNSW(path, hot_bytes=(n // 10) * wrow, pivots=4096,
                         prefetch=8)
    d1, j1 = hyb.ann_batch(queries, k, 48)
    d2, j2 = pf.ann_batch(queries, k, 48)
    np.testing.assert_array_equal(j1, j2)
    np.testing.assert_allclose(d1, d2, rtol=0, atol=0)
    assert pf.prefetch_hits > 0, "lookahead never hit the row cache"
