"""Fused Pallas distance+group-min flat search vs XLA alternatives.

WARNING: on the axon dev tunnel the fused kernel's REAL-TPU Mosaic
compile hangs (DEVNOTES "Pallas groupmin kernel status") — this script
is the repro. Interpret-mode correctness is covered by tests.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

from hnsw_rs_tpu.ops.pallas.l2_groupmin import flat_topk_fused
from hnsw_rs_tpu.ops.quant import quantize, dequantize
from hnsw_rs_tpu.ops.distance import point_normsq
from hnsw_rs_tpu.models.flat import _flat_search_tiled

def bench(n, d, b, k=10):
    rng = np.random.default_rng(0)
    codes, scales = quantize(jnp.asarray(rng.random((n, d), np.float32)))
    normsq = point_normsq(codes, scales)
    q = dequantize(*quantize(jnp.asarray(rng.random((b, d), np.float32))))
    import functools
    for name, f in (
        ("fused", jax.jit(functools.partial(flat_topk_fused, k=k))),
        ("tiled", jax.jit(functools.partial(_flat_search_tiled, k=k))),
    ):
        o = f(q, codes, scales, normsq)
        s0 = int(jnp.sum(o[1]))
        t0 = time.time(); it = 0
        while time.time() - t0 < 3.0:
            int(jnp.sum(f(q, codes, scales, normsq)[1])); it += 1
        dt = (time.time() - t0) / it
        print(f"N={n} d={d} B={b} {name:>6}: {dt*1e3:8.2f} ms  {b/dt:10,.0f} QPS", flush=True)
    # exactness cross-check fused vs tiled on this data
    fd, fi = flat_topk_fused(q, codes, scales, normsq, k)
    td, ti = _flat_search_tiled(q, codes, scales, normsq, k)
    print("  ids match:", bool(jnp.all(fi == ti)), flush=True)

if __name__ == "__main__":
    bench(1_048_576, 96, 1024)
    bench(1_048_576, 96, 4096)
    bench(102_400, 128, 4096)
