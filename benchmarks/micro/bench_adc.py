"""ADC scoring formulations at beam shapes — which gather form does the
TPU like? The PQ beam's per-iteration score is ``adc_score(lut, codes)``
with ``lut`` f32[B, m_pq, 256] and ``codes`` u8[B, C, m_pq] (C = cap per
expanded row): per candidate it reads m_pq scattered LUT entries, and
the 1M pq24+piv row measured a 1000x QPS collapse vs the exact packed
beam (benchmarks/SERVING_MEMORY.json) — suspect: the [B, m, C]
take_along_axis lowers to per-element gathers.

Variants:
  3d    — current: transpose + take_along_axis over axis 2
  flat  — one single-axis take_along_axis over lut.reshape(B, m*256)
          with precomputed flat indices (code + 256*m)
  onehot— one [C, m*256] @ [m*256] batched MXU contraction per query
          (einsum bck,bk->bc on a one-hot encode; trades gather for
          flops + a big broadcast temp)

Run on the real TPU:  python benchmarks/micro/bench_adc.py [--m 24]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
from hnsw_rs_tpu.ops.pq import adc_score  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--b", type=int, default=4096)
p.add_argument("--c", type=int, default=48)
p.add_argument("--m", type=int, default=24)
p.add_argument("--iters", type=int, default=64)
a = p.parse_args()
B, C, M = a.b, a.c, a.m

rng = np.random.default_rng(0)
lut = jnp.asarray(rng.standard_normal((B, M, 256)).astype(np.float32) ** 2)
codes = jnp.asarray(rng.integers(0, 256, (B, C, M), dtype=np.uint8))


def adc_flat(lut, codes):
    b, m, nv = lut.shape
    flat = lut.reshape(b, m * nv)
    idx = codes.astype(jnp.int32) + (
        jnp.arange(m, dtype=jnp.int32) * nv
    )[None, None, :]
    got = jnp.take_along_axis(flat, idx.reshape(b, -1), axis=1)
    return jnp.maximum(
        jnp.sum(got.reshape(b, codes.shape[1], m), axis=2), 0.0
    )


def adc_onehot(lut, codes):
    b, m, nv = lut.shape
    oh = (
        codes[..., None] == jnp.arange(nv, dtype=jnp.uint8)
    ).astype(jnp.bfloat16)  # [B, C, m, 256]
    got = jnp.einsum(
        "bcmv,bmv->bc", oh, lut.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(got, 0.0)


def chain(fn):
    @jax.jit
    def run(lut, codes):
        def body(i, acc):
            # rotate codes so iterations aren't CSE'd away
            c = jnp.roll(codes, i, axis=1)
            return acc + jnp.sum(fn(lut, c))

        return jax.lax.fori_loop(0, a.iters, body, jnp.float32(0))

    return run


ref = np.asarray(adc_score(lut, codes))
for name, fn in (("3d", adc_score), ("flat", adc_flat),
                 ("onehot", adc_onehot)):
    got = np.asarray(fn(lut, codes))
    tol = 0.35 if name == "onehot" else 1e-4  # bf16 LUT rounding
    assert np.abs(got - ref).max() < tol, (name, np.abs(got - ref).max())
    r = chain(fn)
    float(r(lut, codes))  # compile + warm
    t0 = time.time()
    s = float(r(lut, codes))
    dt = (time.time() - t0) / a.iters * 1e3
    print(f"{name:7s}: {dt:8.3f} ms/call  [B={B} C={C} m={M}] sum={s:.1f}",
          flush=True)
