"""PQ-coded HNSW serving mode (``finalize(pq_m=...)``): ADC beams over a
PQ-packed layer 0 + exact rerank — the beyond-HBM memory axis. No
reference analogue (``vectors/src/quant.rs`` stops at 1 byte/dim), so
quality is recall-GATED here rather than oracle-pinned."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import TEST_DATA  # noqa: F401  (conftest forces CPU)
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.ops.pq import adc_score, encode_pq, pq_lut, train_pq
from hnsw_rs_tpu.ops.quant import dequantize, quantize
from hnsw_rs_tpu.search import pack_layer_pq, unpack_rows_pq
from hnsw_rs_tpu.utils import brute_force_nns
from hnsw_rs_tpu.utils.datasets import synthetic_clustered

N, D, K = 3000, 32, 10


def _index_and_data():
    ds = synthetic_clustered(N, D, n_queries=64, seed=7)
    index = HNSW(12, dim=D)
    index.insert_bulk(ds.train)
    return index, ds


def test_pack_layer_pq_roundtrip_exact():
    rng = np.random.default_rng(0)
    adj = rng.integers(-1, 50, size=(50, 6)).astype(np.int32)
    pq_codes = rng.integers(0, 256, size=(50, 8)).astype(np.uint8)
    packed = np.asarray(pack_layer_pq(jnp.asarray(adj), jnp.asarray(pq_codes)))
    assert packed.shape == (50, 6 * (8 + 4))
    nbrs, codes = unpack_rows_pq(jnp.asarray(packed), 6, 8)
    np.testing.assert_array_equal(np.asarray(nbrs), adj)
    safe = np.where(adj >= 0, adj, 0)
    np.testing.assert_array_equal(np.asarray(codes), pq_codes[safe])


def test_adc_score_approximates_l2sq():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500, D)).astype(np.float32)
    q = rng.normal(size=(8, D)).astype(np.float32)
    cb = train_pq(jnp.asarray(x), 8, iters=15, seed=0)
    codes = encode_pq(jnp.asarray(x), cb)
    lut = pq_lut(jnp.asarray(q), cb)
    approx = np.asarray(adc_score(lut, jnp.broadcast_to(codes, (8, 500, 8))))
    exact = np.sum((q[:, None, :] - x[None]) ** 2, axis=-1)
    # ADC reconstruction error is bounded by the quantizer's distortion;
    # this gate just pins "same ballpark + strong rank correlation"
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-3)
    assert float(np.median(rel)) < 0.5
    # rank correlation on one query: top-50 ADC should hit most of the
    # true top-50
    a50 = set(np.argsort(approx[0])[:50].tolist())
    e50 = set(np.argsort(exact[0])[:50].tolist())
    assert len(a50 & e50) >= 25


def test_pq_serving_recall_gate():
    index, ds = _index_and_data()
    truth = brute_force_nns(
        ds.test, index.points.codes, index.points.scales, K
    )
    index.finalize(pivots=512, pq_m=8)
    assert index._pq is not None and index._packed0 is None
    d, ann = index.ann_batch(ds.test, K, ef=96)
    recall = np.mean(
        [len(set(a) & set(t)) / K for a, t in zip(ann.tolist(), truth.tolist())]
    )
    assert recall >= 0.95, f"PQ-serving recall@{K} = {recall}"
    # returned distances are the EXACT reranked ones: spot-check row 0
    qq = np.asarray(dequantize(*quantize(jnp.asarray(ds.test))))
    x0 = np.asarray(
        dequantize(index.points.codes[ann[0]], index.points.scales[ann[0]])
    )
    np.testing.assert_allclose(
        d[0], np.sqrt(np.sum((qq[0][None] - x0) ** 2, -1)), rtol=1e-4,
        atol=1e-4,
    )


def test_adc_score16_matches_naive_lookup():
    """adc_score16 (unrolled compare-select, zero gathers) must equal a
    naive per-element LUT lookup bit-for-bit up to f32 sum order: same
    values as take_along_axis on the unpacked codes."""
    from hnsw_rs_tpu.ops.pq import (
        adc_score16, pack_nibbles, unpack_nibbles,
    )

    rng = np.random.default_rng(3)
    b, c, m = 4, 37, 16
    codes = rng.integers(0, 16, size=(b, c, m)).astype(np.uint8)
    lut = rng.normal(size=(b, m, 16)).astype(np.float32) ** 2
    packed = pack_nibbles(jnp.asarray(codes))
    assert packed.shape == (b, c, m // 2)
    np.testing.assert_array_equal(
        np.asarray(unpack_nibbles(packed)), codes
    )
    got = np.asarray(adc_score16(jnp.asarray(lut), packed))
    want = np.maximum(
        np.take_along_axis(
            lut, codes.transpose(0, 2, 1).astype(np.int64), axis=2
        ).sum(axis=1).transpose(0, 1),
        0.0,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pq4_serving_recall_gate():
    """pq_bits=4 (LUT16): same bytes/point as 8-bit pq_m, gather-free ADC.
    Navigation quality may differ slightly; the exact full-beam rerank
    must keep the end-to-end gate."""
    index, ds = _index_and_data()
    truth = brute_force_nns(
        ds.test, index.points.codes, index.points.scales, K
    )
    index.finalize(pivots=512, pq_m=8, pq_bits=4)
    cb, pq_codes, packed_pq, _rot = index._pq
    assert cb.shape[1] == 16 and cb.shape[0] == 16  # 2*pq_m subspaces
    assert pq_codes.shape[1] == 8  # still pq_m BYTES per point
    d, ann = index.ann_batch(ds.test, K, ef=96)
    recall = np.mean(
        [len(set(a) & set(t)) / K for a, t in zip(ann.tolist(), truth.tolist())]
    )
    assert recall >= 0.95, f"PQ4-serving recall@{K} = {recall}"
    # memory parity with the 8-bit mode's pack (same wrow)
    w4 = packed_pq.shape[1]
    index.finalize(pivots=512, pq_m=8)
    assert index._pq[2].shape[1] == w4


def test_pq_mode_cleared_and_validated():
    index, _ = _index_and_data()
    with pytest.raises(ValueError):
        index.finalize(pq_m=8)  # needs pivots
    with pytest.raises(ValueError):
        index.finalize(pivots=64, pq_m=7)  # must divide dim
    index.finalize(pivots=64, pq_m=8)
    assert index._pq is not None
    index.finalize(pivots=64)  # pq_m=0 clears the PQ mode
    assert index._pq is None and index._packed0 is not None


def test_pq_serving_memory_is_smaller():
    index, _ = _index_and_data()
    index.finalize(pivots=128)
    exact_pack = index._packed0.size
    index.finalize(pivots=128, pq_m=8)
    cb, pq_codes, packed_pq, _rot = index._pq
    pq_bytes = packed_pq.size + pq_codes.size + cb.size * 4
    assert pq_bytes < 0.5 * exact_pack


def test_pq_opq_serving_recall_not_worse():
    index, ds = _index_and_data()
    truth = brute_force_nns(
        ds.test, index.points.codes, index.points.scales, K
    )
    index.finalize(pivots=512, pq_m=8)
    _, ann = index.ann_batch(ds.test, K, ef=96)
    r_pq = np.mean(
        [len(set(a) & set(t)) / K for a, t in zip(ann.tolist(), truth.tolist())]
    )
    index.finalize(pivots=512, pq_m=8, pq_opq=True)
    assert index._pq[3] is not None  # rotation trained and stored
    _, ann_o = index.ann_batch(ds.test, K, ef=96)
    r_opq = np.mean(
        [len(set(a) & set(t)) / K
         for a, t in zip(ann_o.tolist(), truth.tolist())]
    )
    # identical memory; OPQ codes carry strictly lower quantization error
    assert r_opq >= r_pq - 0.02, (r_opq, r_pq)
