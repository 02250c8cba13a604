"""Pallas fused quantized-L2 kernel vs the XLA reference implementation
(interpret mode on CPU; the same code path compiles for TPU)."""

import numpy as np
import jax.numpy as jnp

from hnsw_rs_tpu.ops import pairwise_l2sq_exact, point_normsq, quantize, dequantize
from hnsw_rs_tpu.ops.pallas import pairwise_l2sq_pallas
from hnsw_rs_tpu.utils import gen_rand_vecs


def test_pallas_matches_exact():
    store = gen_rand_vecs(300, 50, seed=0)  # unaligned d and n on purpose
    queries = gen_rand_vecs(70, 50, seed=1)
    codes, scales = quantize(jnp.asarray(store))
    nsq = point_normsq(codes, scales)
    q = dequantize(*quantize(jnp.asarray(queries)))
    got = np.asarray(
        pairwise_l2sq_pallas(q, codes, scales, nsq, tb=64, tn=128, interpret=True)
    )
    want = np.asarray(pairwise_l2sq_exact(q, codes, scales))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_aligned_shapes():
    store = gen_rand_vecs(512, 128, seed=2)
    queries = gen_rand_vecs(128, 128, seed=3)
    codes, scales = quantize(jnp.asarray(store))
    nsq = point_normsq(codes, scales)
    q = dequantize(*quantize(jnp.asarray(queries)))
    got = np.asarray(
        pairwise_l2sq_pallas(q, codes, scales, nsq, tb=128, tn=256, interpret=True)
    )
    want = np.asarray(pairwise_l2sq_exact(q, codes, scales))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_groupmin_topk_matches_sort():
    # fused Pallas distance+group-min (interpret mode) == affine + full sort
    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu.ops.distance import pairwise_l2sq_mxu, point_normsq
    from hnsw_rs_tpu.ops.pallas.l2_groupmin import flat_topk_fused
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.ops.topk import topk_dist_id

    rng = np.random.default_rng(8)
    n, d, b, k = 4100, 24, 12, 10  # non-multiples: exercises padding
    codes, scales = quantize(jnp.asarray(rng.random((n, d), np.float32)))
    normsq = point_normsq(codes, scales)
    q = dequantize(*quantize(jnp.asarray(rng.random((b, d), np.float32))))
    d2 = pairwise_l2sq_mxu(q, codes, scales, normsq)
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), d2.shape)
    rd, ri = topk_dist_id(d2, ids, k)
    fd, fi = flat_topk_fused(q, codes, scales, normsq, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(fi))
    np.testing.assert_allclose(np.asarray(rd), np.asarray(fd), rtol=1e-5)
