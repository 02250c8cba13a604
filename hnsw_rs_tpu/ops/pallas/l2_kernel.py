"""Pallas TPU kernel: fused quantized all-pairs L2.

The framework's hottest dense op — exact distances from a query batch to a
quantized collection (FlatIndex search, IVF list scans, ground-truth
generation; the MXU-native descendant of ``QuantVec::distance_unrolled``,
``vectors/src/quant.rs:14-37``).

The XLA fallback (``ops.distance.pairwise_l2sq_mxu``) materializes a
dequantized f32 copy of each codes tile in HBM when fusion misses; this
kernel keeps the uint8 codes in HBM (4x less bandwidth than an f32 table),
dequantizes *inside VMEM*, and exploits the affine structure so the only
O(B*N*d) work is one MXU contraction per tile:

    |q - (delta*c + min)|^2 = |q|^2 + |x|^2 - 2*(delta*(q.c) + min*sum(q))

Tiling: grid (B/TB, N/TN); each program computes a [TB, TN] output tile
from a [TB, d] query tile and a [TN, d] codes tile. d is zero-padded to a
lane multiple by the caller (zero code columns contribute 0 to ``q.c`` and
``|x|^2``/``|q|^2`` use precomputed/unpadded stats, so padding is exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _l2_kernel(q_ref, codes_ref, delta_ref, mn_ref, nsq_ref, out_ref, *, fast):
    q = q_ref[:]  # [TB, dp] f32
    # Mosaic has no direct u8->f32 cast; hop through int32
    c = codes_ref[:].astype(jnp.int32).astype(jnp.float32)  # [TN, dp]
    if fast:
        # bf16 MXU pass: codes (integers <= 255) are exact in bf16; only
        # the query mantissa rounds (~0.4%) — fine for candidate ranking,
        # not for ground truth
        qdotc = jax.lax.dot_general(
            q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        qdotc = jax.lax.dot_general(
            q, c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TB, TN]
    delta = delta_ref[:]  # [1, TN]
    mn = mn_ref[:]
    nsq = nsq_ref[:]
    qsq = jnp.sum(q * q, axis=1, keepdims=True)  # [TB, 1]
    sumq = jnp.sum(q, axis=1, keepdims=True)
    out_ref[:] = jnp.maximum(
        qsq + nsq - 2.0 * (delta * qdotc + mn * sumq), 0.0
    )


@functools.partial(jax.jit, static_argnames=("tb", "tn", "interpret", "fast"))
def pairwise_l2sq_pallas(
    q: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    normsq: jnp.ndarray,
    tb: int = 256,
    tn: int = 512,
    interpret: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """Squared L2 [B, N] from f32 queries to uint8-quantized points.

    ``q`` f32[B, d], ``codes`` u8[N, d], ``scales`` f32[N, 2] (min, delta),
    ``normsq`` f32[N] precomputed |x|^2 (see ``ops.distance.point_normsq``).
    Shapes are padded internally to tile multiples; extra rows yield
    garbage distances that callers slice away (this wrapper does).
    """
    b, d = q.shape
    n = codes.shape[0]
    dp = _cdiv(max(d, 1), 128) * 128
    bp = _cdiv(max(b, 1), tb) * tb
    np_ = _cdiv(max(n, 1), tn) * tn

    qp = jnp.zeros((bp, dp), jnp.float32).at[:b, :d].set(q)
    cp = jnp.zeros((np_, dp), jnp.uint8).at[:n, :d].set(codes)
    delta = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(scales[:, 1])
    mn = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(scales[:, 0])
    nsq = jnp.zeros((1, np_), jnp.float32).at[0, :n].set(normsq)

    grid = (bp // tb, np_ // tn)
    out = pl.pallas_call(
        functools.partial(_l2_kernel, fast=fast),
        out_shape=jax.ShapeDtypeStruct((bp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp,
            bytes_accessed=bp * dp * 4 + np_ * dp + bp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, cp, delta, mn, nsq)
    return out[:b, :n]
