"""Per-phase device timings for the cluster-bulk layer-0 builder.

The build progress bar ticks at DISPATCH time (the select loop enqueues
async work), so end-to-end rates from the bar are meaningless through
the dev tunnel — the first post-build scalar fetch drains the whole
backlog (observed as a ">40 min hang" in the round-3 1M run). This
bench replays ``build_cluster.build_layer0_clustered`` phase by phase
with an on-device scalar checksum after each phase (and every
``--sync-every`` batches inside the loops), so each number is real
device wall time.

    python benchmarks/micro/bench_cluster_stages.py --n 1000000 [--quick]
"""
import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from hnsw_rs_tpu.build_cluster import (  # noqa: E402
    _any_orphan, _cluster_sel_step, _global_merge, _member_tables,
    _nbr_clusters, _orphan_repair, _recount_indeg, _sel_pos,
    _split_oversized, _table_centroids, kmeans,
)
from hnsw_rs_tpu.ops.quant import dequantize  # noqa: E402
from hnsw_rs_tpu.graphs import LayeredGraph  # noqa: E402
from hnsw_rs_tpu.params import Params  # noqa: E402
from hnsw_rs_tpu.store import PointStore  # noqa: E402
from hnsw_rs_tpu.utils.datasets import synthetic_clustered  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=1_000_000)
p.add_argument("--m", type=int, default=24)
p.add_argument("--ppc", type=int, default=256)
p.add_argument("--fanout", type=int, default=12)
p.add_argument("--pool-p", type=int, default=512)
p.add_argument("--batch-queries", type=int, default=4096)
p.add_argument("--kmeans-iters", type=int, default=4)
p.add_argument("--sync-every", type=int, default=64)
p.add_argument("--pool-approx", action="store_true")
p.add_argument("--no-select-alg4", action="store_true",
               help="nearest-m select; merge union chain owns diversity")
p.add_argument("--merge-slots", type=int, default=0,
               help="incoming reverse-edge slots per row (0 = 2*cap)")
p.add_argument("--merge-bisect", action="store_true",
               help="split phase B: edge sort (3-key vs packed 2-key) and "
               "union-only merge (heuristic=False) before the real merge")
p.add_argument("--quick", action="store_true", help="n=100k")
a = p.parse_args()
if a.quick:
    a.n = 100_000

D = 96
ds = synthetic_clustered(a.n, D, n_queries=16, seed=42)
store = PointStore.from_vectors(ds.train, ml=Params(m=a.m, dim=D).ml)
store.levels[:] = 0  # layer-0 only: upper layers are the wave path's job
n = len(store)
codes, scales = store.codes[:n], store.scales[:n]
params = Params(m=a.m, dim=D)
graph = LayeredGraph(a.m, n)
graph.ensure_level(0)


def sync(x):
    return int(jnp.sum(jnp.abs(jnp.ravel(x)[:16].astype(jnp.float32))))


t0 = time.time()
sync(codes); sync(scales)  # dataset upload + device quantize, separated
print(f"upload+quantize: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
k = max(2, min(n, -(-n // a.ppc)))
cent, assign = kmeans(codes, scales, k, iters=a.kmeans_iters)
sync(cent); sync(assign)
t_km = time.time() - t0
print(f"kmeans (k={k}, iters={a.kmeans_iters}): {t_km:.1f}s", flush=True)

t0 = time.time()
assign_np = np.asarray(assign)
t_fetch = time.time() - t0
smax = max(8, int(np.ceil(n / k * 1.75 / 8)) * 8)
proj = np.asarray(jnp.einsum(
    "nd,d->n", dequantize(codes, scales),
    jnp.asarray(np.random.default_rng(11).standard_normal(96).astype(np.float32)),
))
assign_np, k = _split_oversized(assign_np, k, smax, keys=proj)
table, overflow = _member_tables(assign_np, k, smax)
rch = min(1024, max(8, 1 << max(k - 1, 1).bit_length()))
kpad = -(-k // rch) * rch
tpad = np.full((kpad, smax), -1, np.int32)
tpad[:k] = table
cent, _reps = _table_centroids(codes, scales, jnp.asarray(tpad), rchunk=rch)
cent = cent[:k]
sync(cent)
t_mt = time.time() - t0
print(f"member tables+split+centroids (k={k}, smax={smax}, "
      f"overflow={overflow}): {t_mt:.1f}s (assign fetch {t_fetch:.1f}s)",
      flush=True)

t0 = time.time()
c_fan = min(a.fanout, k)
nbrcl = _nbr_clusters(cent, c_fan)
sync(nbrcl)
print(f"cluster nbr top-k: {time.time()-t0:.1f}s", flush=True)

assert overflow == 0, overflow  # _split_oversized owns coverage

member_dev = jnp.asarray(table)
g = max(1, a.batch_queries // smax)
adj = graph.get_layer(0)
indeg = graph.indeg(0)
cap = graph.layer_cap(0)
n_batches = -(-k // g)
print(f"select: {n_batches} batches of g={g} clusters", flush=True)

t0 = time.time()
sels = []
t_last, done = t0, 0
for bi, base in enumerate(range(0, k, g)):
    cl = np.full((g,), -1, np.int32)
    take = min(g, k - base)
    cl[:take] = np.arange(base, base + take, dtype=np.int32)
    sels.append(_cluster_sel_step(
        codes, scales, member_dev, nbrcl, jnp.asarray(cl),
        m=a.m, pool_p=a.pool_p, pool_approx=a.pool_approx,
        select_alg4=not a.no_select_alg4,
    ))
    if (bi + 1) % a.sync_every == 0 or bi == n_batches - 1:
        sync(sels[-1][2])
        now = time.time()
        print(f"  select batch {bi+1}/{n_batches}: "
              f"{(bi+1-done)/(now-t_last):.2f} batch/s", flush=True)
        t_last, done = now, bi + 1
t_sel = time.time() - t0
print(f"phase SELECT: {t_sel:.1f}s ({n/t_sel:.0f} vec/s)", flush=True)

t0 = time.time()
qflat = jnp.concatenate([s[0] for s in sels])
sel_d2 = jnp.concatenate([s[1] for s in sels])
sel_ids = jnp.concatenate([s[2] for s in sels])
del sels
pos = _sel_pos(qflat, n=n)
sync(pos)
t_own = time.time() - t0
print(f"phase A (row map): {t_own:.1f}s", flush=True)

if a.merge_bisect:
    from hnsw_rs_tpu.ops.topk import INF, PAD_ID

    @functools.partial(jax.jit, static_argnames=("n",))
    def _edge_sort3(qflat, sel_d2, sel_ids, n: int):
        t, m = sel_ids.shape
        e = t * m
        ok = jnp.logical_and(sel_ids != PAD_ID, (qflat >= 0)[:, None])
        tgt0 = jnp.where(ok, sel_ids, n).reshape(e)
        src0 = jnp.broadcast_to(qflat[:, None], (t, m)).reshape(e)
        ed20 = jnp.where(ok, sel_d2, INF).reshape(e)
        tgt_s, ed2_s, src_s = jax.lax.sort(
            (tgt0, ed20, src0), dimension=0, num_keys=3
        )
        return tgt_s[::65536].sum() + src_s[::65536].sum()

    @functools.partial(jax.jit, static_argnames=("n", "keys"))
    def _edge_sort2(qflat, sel_d2, sel_ids, n: int, keys: int):
        # packed key: tgt in the high 32 bits, ordered d2 bits low
        # (d2 >= 0 so its f32 bits are order-isomorphic non-negative i32)
        t, m = sel_ids.shape
        e = t * m
        ok = jnp.logical_and(sel_ids != PAD_ID, (qflat >= 0)[:, None])
        tgt0 = jnp.where(ok, sel_ids, n).astype(jnp.int64).reshape(e)
        src0 = jnp.broadcast_to(qflat[:, None], (t, m)).reshape(e)
        d2b = jax.lax.bitcast_convert_type(
            jnp.where(ok, sel_d2, INF), jnp.int32
        ).astype(jnp.int64).reshape(e)
        key = (tgt0 << 32) | d2b
        key_s, src_s = jax.lax.sort((key, src0), dimension=0, num_keys=keys)
        return key_s[::65536].sum() + src_s[::65536].sum()

    for label, fn in (
        ("3-key (tgt,d2,src)", lambda: _edge_sort3(qflat, sel_d2, sel_ids, n=n)),
        ("2-key (packed,src)", lambda: _edge_sort2(qflat, sel_d2, sel_ids, n=n, keys=2)),
        ("1-key (packed)+payload", lambda: _edge_sort2(qflat, sel_d2, sel_ids, n=n, keys=1)),
    ):
        int(fn())  # compile
        t0 = time.time()
        int(fn()); int(fn())
        print(f"  edge sort {label}: {(time.time()-t0)/2:.2f}s", flush=True)

    t0 = time.time()
    adj_u = _global_merge(
        jnp.full_like(adj, -1), pos, qflat, sel_d2, sel_ids, codes, scales,
        slots=a.merge_slots or 2 * cap,
        rchunk=min(16384, max(1024, 1 << (n - 1).bit_length())),
        heuristic=False,
    )
    sync(adj_u)
    print(f"  union-only merge (heuristic=False, cold): "
          f"{time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    adj_u = _global_merge(
        adj_u, pos, qflat, sel_d2, sel_ids, codes, scales,
        slots=a.merge_slots or 2 * cap,
        rchunk=min(16384, max(1024, 1 << (n - 1).bit_length())),
        heuristic=False,
    )
    sync(adj_u)
    print(f"  union-only merge (heuristic=False, warm): "
          f"{time.time()-t0:.1f}s", flush=True)
    del adj_u

t0 = time.time()
rchunk = min(16384, max(1024, 1 << (n - 1).bit_length()))
slots = a.merge_slots or 2 * cap
adj = _global_merge(adj, pos, qflat, sel_d2, sel_ids, codes, scales,
                    slots=slots, rchunk=rchunk)
sync(adj)
t_rev = time.time() - t0
print(f"phase B (global merge, rchunk={rchunk}): {t_rev:.1f}s", flush=True)

t0 = time.time()
indeg = _recount_indeg(adj)
for r in range(10):
    adj, indeg = _orphan_repair(adj, indeg, round_=r)
    if not bool(_any_orphan(adj, indeg)):
        break
sync(indeg)
t_fix = time.time() - t0
print(f"indeg recount + orphan repair: {t_fix:.1f}s", flush=True)
t_rev += t_fix

total = t_km + t_mt + t_sel + t_own + t_rev
print(f"TOTAL layer-0: {total:.1f}s = {n/total:.0f} vec/s "
      f"(km {t_km:.0f} / tables {t_mt:.0f} / sel {t_sel:.0f} / "
      f"own {t_own:.0f} / rev {t_rev:.0f})", flush=True)
