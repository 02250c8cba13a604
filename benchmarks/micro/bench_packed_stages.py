"""Direct packed-vs-plain stage timing at the headline config (M=24,
efc=128, W=4096). Run on the real TPU after bench_wave_stages24 has
warmed the caches/index."""
import os, sys, time, functools
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
index = HNSW(M, ef_cons=EFC, dim=D)
index.insert_bulk(ds.train)
for a in index.graph.adjs:
    int(jnp.sum(jnp.abs(a) % 7))
print("built", flush=True)

from hnsw_rs_tpu.build import _apply_wave_impl, _pack_rows
from hnsw_rs_tpu.search import (search_layer, search_layer_packed, seed_entry,
                                pack_layer, comb_table)
from hnsw_rs_tpu.heuristic import (select_heuristic, select_heuristic_packed,
                                   build_candidate_pool, build_candidate_pool_packed)

codes, scales = index.points.codes, index.points.scales
adj0 = index.graph.get_layer(0)
indeg0 = index.graph.indeg(0)
packed0 = index._packed0 if index._packed0 is not None else pack_layer(adj0, codes, scales)
comb = comb_table(codes, scales)
W = 4096
ids_w = jnp.asarray(np.arange(N - W, N, dtype=np.int32))
q = dequantize(codes[ids_w], scales[ids_w])
ed2, eids = seed_entry(codes, scales, q, jnp.asarray(index.params.ep, jnp.int32))

def timeit(f, *a, iters=3):
    o = f(*a); [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    t0 = time.time()
    for _ in range(iters): o = f(*a)
    [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    return (time.time()-t0)/iters, o

MI = 2*EFC+16
sl_p = jax.jit(functools.partial(search_layer, ef=EFC, max_iters=MI))
sl_k = jax.jit(functools.partial(search_layer_packed, ef=EFC, max_iters=MI))
t, (bd2, bids) = timeit(lambda: sl_p(adj0, codes, scales, q, ed2, eids, forbid=ids_w))
print(f"search plain : {t*1e3:7.1f} ms", flush=True)
t, (bd2k, bidsk) = timeit(lambda: sl_k(packed0, q, ed2, eids, forbid=ids_w))
same = bool(jnp.array_equal(bids, bidsk))
print(f"search packed: {t*1e3:7.1f} ms  identical={same}", flush=True)
if not same:
    mm = np.flatnonzero(np.any(np.asarray(bids) != np.asarray(bidsk), axis=1))
    r = int(mm[0])
    a, b = np.asarray(bids[r]), np.asarray(bidsk[r])
    da, db = np.asarray(bd2[r]), np.asarray(bd2k[r])
    j = int(np.flatnonzero(a != b)[0])
    print(f"  mismatch rows: {mm.size}/{bids.shape[0]}; row {r} slot {j}: "
          f"plain (id={a[j]}, d2={da[j]!r}) vs packed (id={b[j]}, d2={db[j]!r})",
          flush=True)
    # are the distances ULP-close (fusion rounding) or structurally off?
    print(f"  row {r} d2 maxdiff={np.max(np.abs(da - db)):.3e}", flush=True)

pool_p = jax.jit(functools.partial(build_candidate_pool, extend=True))
pool_k = jax.jit(functools.partial(build_candidate_pool_packed, extend=True))
t, (pd, pi) = timeit(lambda: pool_p(adj0, codes, scales, q, bd2, bids, forbid=ids_w))
print(f"pool  plain : {t*1e3:7.1f} ms", flush=True)
t, (pdk, pik) = timeit(lambda: pool_k(packed0, q, bd2, bids, forbid=ids_w))
print(f"pool  packed: {t*1e3:7.1f} ms  identical={bool(jnp.array_equal(pi, pik))}", flush=True)

sh_p = jax.jit(functools.partial(select_heuristic, m=M, extend_cands=True, keep_pruned=True))
sh_k = jax.jit(functools.partial(select_heuristic_packed, m=M, extend_cands=True, keep_pruned=True))
t, (sd2, sids) = timeit(lambda: sh_p(adj0, codes, scales, q, bd2, bids, forbid=ids_w))
print(f"heur  plain : {t*1e3:7.1f} ms", flush=True)
t, (sd2k, sidsk) = timeit(lambda: sh_k(packed0, codes, scales, q, bd2, bids, forbid=ids_w))
print(f"heur  packed: {t*1e3:7.1f} ms  identical={bool(jnp.array_equal(sids, sidsk))}", flush=True)

ap_p = jax.jit(_apply_wave_impl)
ap_k = jax.jit(functools.partial(_apply_wave_impl))
t, _ = timeit(lambda: ap_p(adj0, indeg0, codes, scales, ids_w, sd2, sids))
print(f"apply plain : {t*1e3:7.1f} ms", flush=True)
t, _ = timeit(lambda: ap_k(adj0, indeg0, codes, scales, ids_w, sd2, sids, packed0, comb))
print(f"apply packed: {t*1e3:7.1f} ms", flush=True)
