"""Fused distance + group-min Pallas kernel: exact flat top-k whose
[B, N] distance matrix NEVER hits HBM.

The measured wall for flat search at scale is not the MXU (101+ TF/s)
but the [B, N] reduction: materializing distances costs GBs of HBM
traffic and every XLA reduction over them is slow (full two-key sort:
minutes; ``lax.top_k``: ~65 ms; ``approx_min_k``: ~27 ms per 1024
queries at N=1M — benchmarks/micro/bench_topk_variants.py). This kernel
computes the quantized-affine distances tile by tile in VMEM and writes
only each 128-column GROUP's lexicographic (d2, id) minimum — a 128×
smaller output.

Exact top-k then takes two cheap passes (``flat_topk_fused``):

1. this kernel → group minima [N/128, B] (transposed for TPU tiling);
2. the top-k groups by (min d2, id) PROVABLY contain every true top-k
   element (if element x with rank <= k lies in group g, then
   lex-min(g) <= x <= the k-th element; distinct groups have distinct
   minima, so at most k groups qualify); gather those groups' rows
   (block-shaped gathers: wide rows per query, not narrow per-element
   ones) and rank them with the affine distance. A margin of extra
   groups (``_MARGIN``) absorbs any ULP-level disagreement between the
   Mosaic matmul and the XLA rescoring matmul at the k-th boundary.

The reference's hot kernel role: ``QuantVec::distance_unrolled``
(``vectors/src/quant.rs:14-37``) — here fused with the reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
_TQ = 256  # query tile
_TN = 2048  # collection tile (16 groups)
_MARGIN = 8  # extra groups rescored in pass 2 (ULP safety at the boundary)


def _kernel(q_ref, codes_ref, scales_ref, normsq_ref, outd_ref, outi_ref):
    """Distances computed TRANSPOSED ([TN, TQ]) so the per-128-group
    reduce runs over the SUBLANE-grouped axis of a [g, GROUP, TQ] view
    and the [g, TQ] result stores as one full block. (Per-row 1-D
    stores hung the Mosaic compile on real hardware; a [TQ, g] output
    violates the minor-dim-divisible-by-128 block constraint.)"""
    q = q_ref[...]  # [TQ, d] f32
    # Mosaic has no direct u8->f32 cast; hop through int32
    c = codes_ref[...].astype(jnp.int32).astype(jnp.float32)  # [TN, d]
    cdotq = jax.lax.dot_general(
        c, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TN, TQ]
    mn = scales_ref[:, 0][:, None]
    delta = scales_ref[:, 1][:, None]
    qsum = jnp.sum(q, axis=1)[None, :]  # [1, TQ]
    qsq = jnp.sum(q * q, axis=1)[None, :]
    d2 = qsq + normsq_ref[:, 0][:, None] - 2.0 * (delta * cdotq + mn * qsum)
    d2 = jnp.maximum(d2, 0.0)  # [TN, TQ]
    tq = d2.shape[1]
    base = pl.program_id(1) * _TN
    g = _TN // GROUP
    d3 = d2.reshape(g, GROUP, tq)
    gmin3 = jnp.min(d3, axis=1)  # [g, TQ]
    row3 = jax.lax.broadcasted_iota(jnp.int32, (g, GROUP, tq), 1)
    amin3 = jnp.min(
        jnp.where(d3 == gmin3[:, None, :], row3, GROUP), axis=1
    )  # id tie-break: smallest row index among equal minima
    off = jax.lax.broadcasted_iota(jnp.int32, (g, tq), 0) * GROUP
    outd_ref[...] = gmin3
    outi_ref[...] = base + off + amin3


def group_min_d2(
    q: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    normsq: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-128-group lexicographic (d2, row) minima, TRANSPOSED:
    (gmin_d2 [N/128, B], gmin_row [N/128, B]).

    Inputs must be pre-padded: B a multiple of 256, N of 2048 (pad
    ``normsq`` with +inf so pad rows never win). See :func:`flat_topk_fused`.
    """
    b, d = q.shape
    n = codes.shape[0]
    grid = (b // _TQ, n // _TN)
    gout = _TN // GROUP
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gout, _TQ), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((gout, _TQ), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // GROUP, b), jnp.float32),
            jax.ShapeDtypeStruct((n // GROUP, b), jnp.int32),
        ],
        interpret=interpret,
    )(q, codes, scales, normsq.reshape(n, 1))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def flat_topk_fused(
    q: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    normsq: jnp.ndarray,
    k: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k flat search, fused: returns (d2 [B, k], ids [B, k])
    ordered by (d2, id). Handles arbitrary B / N by padding."""
    from ...ops.topk import PAD_ID, sort_dist_id

    b0, d = q.shape
    n0 = codes.shape[0]
    b = -(-b0 // _TQ) * _TQ
    n = -(-n0 // _TN) * _TN
    if b != b0:
        q = jnp.pad(q, ((0, b - b0), (0, 0)))
    if n != n0:
        codes = jnp.pad(codes, ((0, n - n0), (0, 0)))
        scales = jnp.pad(scales, ((0, n - n0), (0, 0)))
        normsq = jnp.pad(normsq, (0, n - n0), constant_values=jnp.inf)

    gd_t, gi_t = group_min_d2(q, codes, scales, normsq, interpret=interpret)
    gd, gi = gd_t.T, gi_t.T  # [B, N/128]

    # top (k + margin) groups by (d2, id); distinct groups have distinct
    # minima, so k groups suffice in exact arithmetic — the margin covers
    # Mosaic-vs-XLA ULP wobble at the k-th boundary
    l = min(k + _MARGIN, gd.shape[1])
    ng = jnp.argsort(gd, axis=1, stable=True)[:, :l]
    grp = jnp.take_along_axis(gi, ng, axis=1) // GROUP  # [B, L] group index

    # gather the candidate groups as BLOCK rows (L wide gathers/query)
    cb = codes.reshape(n // GROUP, GROUP * d)
    sb = scales.reshape(n // GROUP, GROUP * 2)
    nb = normsq.reshape(n // GROUP, GROUP)
    crow = cb[grp].reshape(b, l * GROUP, d).astype(jnp.float32)
    srow = sb[grp].reshape(b, l * GROUP, 2)
    nrow = nb[grp].reshape(b, l * GROUP)
    ids = (grp[:, :, None] * GROUP + jnp.arange(GROUP)[None, None, :]).reshape(
        b, l * GROUP
    )

    # affine rescoring of the candidate groups
    qdotc = jnp.einsum(
        "bd,bkd->bk", q, crow, precision=jax.lax.Precision.HIGHEST
    )
    qsum = jnp.sum(q, axis=1, keepdims=True)
    qsq = jnp.sum(q * q, axis=1, keepdims=True)
    d2 = jnp.maximum(
        qsq + nrow - 2.0 * (srow[..., 1] * qdotc + srow[..., 0] * qsum), 0.0
    )
    d2 = jnp.where(ids < n0, d2, jnp.inf)
    idsm = jnp.where(ids < n0, ids, PAD_ID)
    sd, si = sort_dist_id(d2, idsm)
    return sd[:b0, :k], si[:b0, :k]
