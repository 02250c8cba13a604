"""Construction-search convergence at 1M: does the lockstep beam loop run
to the max_iters cap (2*efc+16) or converge early? Times search_layer on
the cached 1M graph at several caps and checks beam equality — if a
tighter cap is both faster and beam-identical, the default cap is pure
waste. Run on the real TPU."""
import os, sys, time, functools
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.search import search_layer, seed_entry
from hnsw_rs_tpu.ops.quant import dequantize

tag = "idx_n1000000_d96_m24_efc128"
idx_dir = os.path.join(ROOT, ".bench_cache", tag)
if not os.path.isdir(idx_dir):
    print("no cached 1M index; run bench.py first"); sys.exit(1)
index = HNSW.load(idx_dir)
codes, scales = index.points.codes, index.points.scales
adj0 = index.graph.get_layer(0)
N = len(index)
EFC = 128
W = 4096
rng = np.random.default_rng(0)
ids_w = jnp.asarray(rng.choice(N, W, replace=False).astype(np.int32))
q = dequantize(codes[ids_w], scales[ids_w])
ed2, eids = seed_entry(codes, scales, q, jnp.asarray(index.params.ep, jnp.int32))

def timeit(f, iters=3):
    o = f(); [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    t0 = time.time()
    for _ in range(iters): o = f()
    [int(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0))) for x in jax.tree.leaves(o)]
    return (time.time()-t0)/iters, o

ref = None
for mi in (272, 192, 160, 144, 136, 132):
    sl = jax.jit(functools.partial(search_layer, ef=EFC, max_iters=mi))
    t, (bd, bi) = timeit(lambda: sl(adj0, codes, scales, q, ed2, eids, forbid=ids_w))
    if ref is None:
        ref = bi
        print(f"mi={mi}: {t*1e3:7.1f} ms  (reference)", flush=True)
    else:
        same = bool(jnp.array_equal(ref, bi))
        print(f"mi={mi}: {t*1e3:7.1f} ms  beams identical to mi=272: {same}", flush=True)
