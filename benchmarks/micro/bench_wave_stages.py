"""Per-stage wave-build timing at N=100k (search / heuristic / apply) and
packed-vs-plain serving QPS. Run on the real TPU."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.utils.datasets import synthetic_clustered
from hnsw_rs_tpu.ops.quant import quantize, dequantize

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, M, EFC = 64, 16, 64
ds = synthetic_clustered(N, D, n_queries=256, seed=0)

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

# stage split at W=4096 on the built graph
from hnsw_rs_tpu.build import _wave_layer_step, _apply_wave
from hnsw_rs_tpu.search import search_layer, seed_entry
from hnsw_rs_tpu.heuristic import select_heuristic
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

def timeit(f, *a, iters=3):
    o = f(*a); [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    t0 = time.time()
    for _ in range(iters): o = f(*a)
    [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    return (time.time()-t0)/iters, o

t, (bd2, bids) = timeit(lambda: sl(adj0, codes, scales, q, ed2, eids, forbid=ids_w))
print(f"search_layer  W={W}: {t*1e3:7.1f} ms", flush=True)
t, (sd2, sids) = timeit(lambda: sh(adj0, codes, scales, q, bd2, bids, forbid=ids_w))
print(f"select_heur   W={W}: {t*1e3:7.1f} ms", flush=True)
t, _ = timeit(lambda: _apply_wave(adj0, indeg0, codes, scales, ids_w, sd2, sids))
print(f"apply_wave    W={W}: {t*1e3:7.1f} ms", flush=True)

# packed vs plain serving QPS
index.finalize()
qs = dequantize(*quantize(jnp.asarray(np.tile(ds.test, (64, 1))[:16384])))
from hnsw_rs_tpu.models.hnsw import _ann_jit, _ann_packed_jit
table = index._serving_table()
ep = jnp.asarray(index.params.ep, jnp.int32)
adjs = tuple(index.graph.adjs)
import functools as ft
@ft.partial(jax.jit, static_argnames=("ef",))
def f1(adjs, table, scales, q, ep, ef):
    return jnp.sum(_ann_jit(adjs, table, scales, q, ep, ef, 10, 2*ef+16)[1])
@ft.partial(jax.jit, static_argnames=("ef",))
def f2(adjs_u, packed0, codes, scales, q, ep, ef):
    return jnp.sum(_ann_packed_jit(adjs_u, packed0, codes, scales, q, ep, ef, 10, 2*ef+16)[1])
for ef in (32, 64, 128):
    for name, f, a in (("plain", f1, (adjs, table, scales, qs, ep)),
                       ("packed", f2, (adjs[1:], index._packed0, codes, scales, qs, ep))):
        int(f(*a, ef=ef))
        t0 = time.time(); it = 0
        while time.time() - t0 < 3.0:
            int(f(*a, ef=ef)); it += 1
        print(f"serve {name:>6} ef={ef:3d}: {16384*it/(time.time()-t0):10,.0f} QPS", flush=True)
