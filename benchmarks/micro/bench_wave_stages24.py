"""Per-stage wave-build timing at the HEADLINE config (M=24, efc=128).
Run on the real TPU. Also splits select_heuristic into pool-build vs
accept-loop."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.utils.datasets import synthetic_clustered
from hnsw_rs_tpu.ops.quant import dequantize

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, M, EFC = 96, 24, 128
ds = synthetic_clustered(N, D, n_queries=64, seed=0)

t0 = time.time()
index = HNSW(M, ef_cons=EFC, dim=D)
index.insert_bulk(ds.train)
for a in index.graph.adjs:
    int(jnp.sum(jnp.abs(a) % 7))
print(f"build cold: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
index = HNSW(M, ef_cons=EFC, dim=D)
index.insert_bulk(ds.train)
for a in index.graph.adjs:
    int(jnp.sum(jnp.abs(a) % 7))
dt = time.time() - t0
print(f"build warm: {dt:.1f}s = {N/dt:.0f} vec/s", flush=True)

from hnsw_rs_tpu.build import _apply_wave
from hnsw_rs_tpu.search import search_layer, seed_entry
from hnsw_rs_tpu.heuristic import select_heuristic, build_candidate_pool
import functools

codes, scales = index.points.codes, index.points.scales
adj0 = index.graph.get_layer(0)
indeg0 = index.graph.indeg(0)
W = 4096
ids_w = jnp.asarray(np.arange(N - W, N, dtype=np.int32))
q = dequantize(codes[ids_w], scales[ids_w])
ed2, eids = seed_entry(codes, scales, q, jnp.asarray(index.params.ep, jnp.int32))

sl = jax.jit(functools.partial(search_layer, ef=EFC, max_iters=2*EFC+16))
sh = jax.jit(functools.partial(select_heuristic, m=M, extend_cands=True, keep_pruned=True))
pool = jax.jit(functools.partial(build_candidate_pool, extend=True))

def timeit(f, *a, iters=3):
    o = f(*a); [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    t0 = time.time()
    for _ in range(iters): o = f(*a)
    [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    return (time.time()-t0)/iters, o

t, (bd2, bids) = timeit(lambda: sl(adj0, codes, scales, q, ed2, eids, forbid=ids_w))
print(f"search_layer  W={W}: {t*1e3:7.1f} ms", flush=True)
t, _ = timeit(lambda: pool(adj0, codes, scales, q, bd2, bids, forbid=ids_w))
print(f"  pool-build  W={W}: {t*1e3:7.1f} ms", flush=True)
t, (sd2, sids) = timeit(lambda: sh(adj0, codes, scales, q, bd2, bids, forbid=ids_w))
print(f"select_heur   W={W}: {t*1e3:7.1f} ms", flush=True)
t, _ = timeit(lambda: _apply_wave(adj0, indeg0, codes, scales, ids_w, sd2, sids))
print(f"apply_wave    W={W}: {t*1e3:7.1f} ms", flush=True)
