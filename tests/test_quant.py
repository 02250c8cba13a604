"""Kernel-layer tests: quantization + distance identities.

Mirrors ``vectors/src/quant.rs:127-203``, ``vectors/src/full.rs:72-148``
and the 1%-tolerance contract of ``vectors/tests/full_lvq_tests.rs:4-27``.
"""

import numpy as np
import jax.numpy as jnp

from hnsw_rs_tpu.ops import (
    dequantize,
    l2,
    l2sq,
    pairwise_l2sq_exact,
    pairwise_l2sq_mxu,
    quantize,
)
from hnsw_rs_tpu.utils import gen_rand_vecs


def qdist(a, b):
    """Quantized distance between two raw vectors, reference semantics."""
    ca, sa = quantize(jnp.asarray(a, jnp.float32))
    cb, sb = quantize(jnp.asarray(b, jnp.float32))
    return float(l2(dequantize(ca, sa), dequantize(cb, sb)))


def test_distance_identities():
    # hand-computed identities from vectors/src/quant.rs:152-203
    assert np.isclose(qdist([0.5], [0.25]), 0.25)
    assert np.isclose(qdist([0.75], [0.25]), 0.5)
    assert np.isclose(qdist([0.0, 0.0], [0.0, 1.0]), 1.0, atol=1e-6)
    assert np.isclose(qdist([1.0, 0.0], [0.0, 1.0]), np.sqrt(2.0), atol=1e-6)
    assert np.isclose(qdist([-1.0, 0.0], [0.0, 1.0]), np.sqrt(2.0), atol=1e-6)
    assert np.isclose(qdist([1.0, 0.0], [0.0, -1.0]), np.sqrt(2.0), atol=1e-6)


def test_self_distance_zero():
    v = gen_rand_vecs(1, 128, seed=0)[0]
    assert qdist(v, v) == 0.0


def test_distances_nonnegative():
    vs = gen_rand_vecs(101, 128, seed=1)
    codes, scales = quantize(jnp.asarray(vs))
    d2 = pairwise_l2sq_exact(dequantize(codes[:1], scales[:1]), codes, scales)
    assert np.all(np.asarray(d2) >= 0.0)


def test_quantization_roundtrip_values():
    # codec round-trip: dequantized values are stable under re-quantization
    # (serialization test analogue, vectors/src/quant.rs:133-141)
    v = gen_rand_vecs(4, 128, seed=2)
    c1, s1 = quantize(jnp.asarray(v))
    x1 = dequantize(c1, s1)
    c2, s2 = quantize(x1)
    x2 = dequantize(c2, s2)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=0, atol=1e-6)


def test_quant_error_under_one_percent():
    # the recall-parity anchor: quantized L2 within 1% of full-precision L2
    # over 1000 random 128-d pairs (vectors/tests/full_lvq_tests.rs:4-27)
    rng = np.random.default_rng(3)
    a = rng.random((1000, 128), dtype=np.float32)
    b = rng.random((1000, 128), dtype=np.float32)
    full = np.sqrt(np.sum((a - b) ** 2, axis=-1))
    ca, sa = quantize(jnp.asarray(a))
    cb, sb = quantize(jnp.asarray(b))
    quant = np.asarray(l2(dequantize(ca, sa), dequantize(cb, sb)))
    rel = np.abs(quant - full) / full
    assert np.max(rel) < 0.01


def test_constant_vector_quantizes_exactly():
    # delta == 0 edge case: codes 0, dequant == min
    c, s = quantize(jnp.asarray([[3.5, 3.5, 3.5]]))
    assert np.all(np.asarray(c) == 0)
    np.testing.assert_allclose(
        np.asarray(dequantize(c, s)), [[3.5, 3.5, 3.5]], atol=0
    )


def test_mxu_matches_exact_pairwise():
    vs = gen_rand_vecs(256, 64, seed=4)
    q = gen_rand_vecs(32, 64, seed=5)
    codes, scales = quantize(jnp.asarray(vs))
    qf = dequantize(*quantize(jnp.asarray(q)))
    d_exact = np.asarray(pairwise_l2sq_exact(qf, codes, scales))
    d_mxu = np.asarray(pairwise_l2sq_mxu(qf, codes, scales))
    np.testing.assert_allclose(d_mxu, d_exact, rtol=1e-4, atol=1e-4)


def test_l2sq_broadcast():
    a = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(l2sq(a, b)), [1.0, 1.0])


def test_host_quantize_matches_device():
    # quantize_np is the host twin used by PointStore.from_vectors to
    # upload u8 codes instead of f32 vectors (4x less transfer); its
    # codes and scales must match the device path bit-for-bit
    from hnsw_rs_tpu.ops.quant import quantize_np

    vs = np.asarray(gen_rand_vecs(512, 96, seed=9))
    vs[7, :] = 2.25  # delta == 0 row
    cd, sd = quantize(jnp.asarray(vs))
    ch, sh = quantize_np(vs)
    np.testing.assert_array_equal(np.asarray(cd), ch)
    np.testing.assert_array_equal(np.asarray(sd), sh)
