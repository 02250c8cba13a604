"""Parametrized 1M build-throughput ladder: one (config -> rate, recall)
row per invocation, for the round-3 builder push (VERDICT: >=15x the
measured single-core C++ baseline at N=1M).

    python benchmarks/micro/bench_build_cfg.py \
        [--n 1000000] [--mi 96] [--efc 128] [--seeded] \
        [--packed off|auto|on] [--lag 8] [--wave-sort] [--wave-cap 4096] \
        [--tag label]

Builds twice (cold = remote compiles, warm = the reported rate), then
spot-checks recall@10 at the headline serving config (pivots=8192,
(ef=40, mi=24) and (ef=48, mi=32)) against exact quantized-space ground
truth. Run on the real TPU.
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
from hnsw_rs_tpu import HNSW  # noqa: E402
from hnsw_rs_tpu.models.flat import _flat_search_tiled  # noqa: E402
from hnsw_rs_tpu.models.hnsw import (  # noqa: E402
    _ann_seeded_jit,
    _ann_seeded_probe_jit,
)
from hnsw_rs_tpu.ops.distance import point_normsq  # noqa: E402
from hnsw_rs_tpu.ops.quant import dequantize, quantize  # noqa: E402
from hnsw_rs_tpu.utils.datasets import synthetic_clustered  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=1_000_000)
p.add_argument("--mi", type=int, default=96)
p.add_argument("--efc", type=int, default=128)
p.add_argument("--m", type=int, default=24)
p.add_argument("--seeded", action="store_true")
p.add_argument("--cluster", action="store_true", help="cluster-bulk layer-0 build")
p.add_argument("--pool-approx", action="store_true",
               help="cluster pool via lax.approx_max_k")
p.add_argument("--no-select-alg4", action="store_true",
               help="nearest-m select; merge union chain owns diversity")
p.add_argument("--ppc", type=int, default=256, help="cluster points-per-cluster")
p.add_argument("--pool-p", type=int, default=512)
p.add_argument("--fanout", type=int, default=12,
               help="cluster candidate-pool fanout (nearest clusters)")
p.add_argument("--batch-queries", type=int, default=4096)
p.add_argument("--kmeans-iters", type=int, default=4)
p.add_argument("--merge-slots", type=int, default=0,
               help="incoming reverse-edge slots per row (0 = 2*cap)")
p.add_argument("--pivots", type=int, default=8192)
p.add_argument("--packed", default="off", choices=["off", "auto", "on"])
p.add_argument("--lag", type=int, default=1)
p.add_argument("--wave-sort", action="store_true")
p.add_argument("--wave-cap", type=int, default=4096)
p.add_argument("--once", action="store_true", help="skip the cold build")
p.add_argument("--regime", default="clustered",
               choices=["clustered", "heavy-tailed"],
               help="dataset regime (heavy-tailed: Zipf blob sizes + scale "
                    "spread + 20%% tail queries — the second committed "
                    "serving regime)")
p.add_argument("--cover", type=float, default=0.25,
               help="finalize pivot_cover (k-center fill share)")
p.add_argument("--nq", type=int, default=256)
p.add_argument("--shortlist", type=int, default=0,
               help="finalize pivot_shortlist=T: probed serving ladder "
                    "(per-pivot top-T lists enter the beam at iter 0)")
p.add_argument("--probes", type=int, default=16,
               help="pivots probed per query in the shortlist mode")
p.add_argument("--refine", type=int, default=0,
               help="HNSW.refine(rounds=R) NN-descent passes on layer 0 "
                    "before finalize")
p.add_argument("--save-idx", default="",
               help="save the built index here (serving-sweep reuse)")
p.add_argument("--load-idx", default="",
               help="load a prior --save-idx index instead of building")
p.add_argument("--probe-diag", action="store_true",
               help="after the ladder: pure-IVF recall matrix over "
                    "(probes, T) slices of the shortlist table — the "
                    "coverage ceiling of probing alone, no beam walk")
p.add_argument("--tag", default="")
a = p.parse_args()

D, K = 96, 10
if a.regime == "heavy-tailed":
    from hnsw_rs_tpu.utils.datasets import synthetic_heavy_tailed

    ds = synthetic_heavy_tailed(a.n, D, n_queries=a.nq, seed=42)
else:
    ds = synthetic_clustered(a.n, D, n_queries=a.nq, seed=42)
kw = dict(
    max_iters=a.mi,
    build_seeded=a.seeded,
    packed_build={"off": False, "auto": "auto", "on": True}[a.packed],
    pack_lag=a.lag,
    wave_sort=a.wave_sort,
    wave_cap=a.wave_cap,
    cluster_build=a.cluster,
    cluster_kwargs=dict(
        pool_approx=a.pool_approx, points_per_cluster=a.ppc,
        pool_p=a.pool_p, batch_queries=a.batch_queries, fanout=a.fanout,
        kmeans_iters=a.kmeans_iters, select_alg4=not a.no_select_alg4,
        merge_slots=a.merge_slots,
    ) if a.cluster else None,
)
tag = a.tag or (
    f"mi={a.mi} efc={a.efc}"
    + (f" {a.regime}" if a.regime != "clustered" else "")
    + (f" ppc={a.ppc}" if a.ppc != 256 else "")
    + (f" cover={a.cover}" if a.cover != 0.25 else "")
    + (f" piv={a.pivots}" if a.pivots != 8192 else "")
    + (" seeded" if a.seeded else "")
    + (" cluster" if a.cluster else "")
    + (f" fan={a.fanout}" if a.fanout != 12 else "")
    + (f" pp={a.pool_p}" if a.pool_p != 512 else "")
    + (f" ki={a.kmeans_iters}" if a.kmeans_iters != 4 else "")
    + (f" slots={a.merge_slots}" if a.merge_slots else "")
    + (" noalg4" if a.no_select_alg4 else "")
    + (f" sl={a.shortlist}x{a.probes}" if a.shortlist else "")
    + (f" ref={a.refine}" if a.refine else "")
    + (f" packed:{a.packed}/lag{a.lag}" if a.packed != "off" else "")
    + (" wsort" if a.wave_sort else "")
    + (f" wcap={a.wave_cap}" if a.wave_cap != 4096 else "")
)


def build(label):
    t0 = time.time()
    idx = HNSW(a.m, ef_cons=a.efc, dim=D)
    idx.insert_bulk(ds.train, verbose=True, **kw)
    for adj in idx.graph.adjs:
        int(jnp.sum(jnp.abs(adj) % 7))
    dt = time.time() - t0
    print(f"[{tag}] {label}: {dt:.1f}s = {a.n/dt:.0f} vec/s", flush=True)
    return idx


if a.load_idx and os.path.isdir(a.load_idx):
    idx = HNSW.load(a.load_idx)
    print(f"[{tag}] loaded {a.load_idx} (n={len(idx)})", flush=True)
else:
    if not a.once:
        idx = build("cold")
    idx = build("warm")
    if a.save_idx:
        idx.save(a.save_idx)
        print(f"[{tag}] saved {a.save_idx}", flush=True)

qq = dequantize(*quantize(jnp.asarray(ds.test)))
normsq = point_normsq(idx.points.codes, idx.points.scales)
_, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
    qq, idx.points.codes, idx.points.scales, normsq
)
truth = [set(t) for t in np.asarray(ti)[:, :K]]
if a.refine:
    t0 = time.time()
    idx.refine(rounds=a.refine)
    for adj in idx.graph.adjs:
        int(jnp.sum(jnp.abs(adj) % 7))
    print(f"[{tag}] refine x{a.refine}: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
idx.finalize(pivots=a.pivots, pivot_cover=a.cover,
             pivot_shortlist=a.shortlist)
int(jnp.sum(idx._pivots[0]))
print(f"[{tag}] finalize: {time.time()-t0:.1f}s", flush=True)
ladder = ((16, 8), (24, 12), (40, 24), (48, 32), (64, 56), (96, 80))
if a.regime == "heavy-tailed":  # this regime's gate sits much deeper
    ladder += ((128, 112), (192, 200), (256, 280), (384, 500), (512, 700))
for ef, mi_q in ladder:
    if a.shortlist:
        _, ann = _ann_seeded_probe_jit(
            idx._packed0, idx._pivots[0], idx._pivots[1],
            idx._pivot_shortlist, idx.points.codes, idx.points.scales,
            qq, ef, K, mi_q, a.probes, 1,
        )
    else:
        _, ann = _ann_seeded_jit(
            idx._packed0, idx._pivots[0], idx._pivots[1], qq, ef, K, mi_q, 1
        )
    rec = float(
        np.mean([len(set(x) & t) / K for x, t in zip(np.asarray(ann), truth)])
    )
    print(f"[{tag}] recall@10 ef={ef} mi={mi_q}: {rec:.4f}", flush=True)

if a.probe_diag:
    # pure-IVF coverage ceiling: top-K of the probed shortlist members
    # alone (exact scores, NO beam walk) for (probes, T) slices of the
    # one built table — separates probe-coverage misses from walk misses
    import jax

    from hnsw_rs_tpu.ops.distance import l2sq
    from hnsw_rs_tpu.search import _pivot_seeds_pos, dedup_ids, sort_dist_id

    @functools.partial(jax.jit, static_argnames=("probes", "t", "k"))
    def ivf_only(shortlist, pivot_ids, pivot_vecs, codes, scales, q,
                 probes, t, k):
        _, _, pos = _pivot_seeds_pos(pivot_ids, pivot_vecs, q,
                                     max(probes, 16))
        cand = shortlist[pos[:, :probes], :t].reshape(q.shape[0], -1)
        safe = jnp.clip(jnp.where(cand >= 0, cand, 0), 0,
                        codes.shape[0] - 1)
        parts = []
        for i in range(0, safe.shape[1], 64):
            c = safe[:, i:i + 64]
            vec = dequantize(codes[c], scales[c])
            parts.append(l2sq(q[:, None, :], vec))
        d2s = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        d2s = jnp.where(cand >= 0, d2s, jnp.inf)
        ids = jnp.where(cand >= 0, cand, 2**31 - 1)
        # duplicates (one point in several probed shortlists) must not
        # occupy top-k slots — dedup then (d2, id)-sort
        d2s, ids = dedup_ids(d2s, ids)
        d2s, ids = sort_dist_id(d2s, ids)
        return ids[:, :k]

    for probes_n in (8, 16, 32, 64):
        for t_n in (16, 32, 64, 128):
            if t_n > idx._pivot_shortlist.shape[1]:
                continue
            ids = np.asarray(ivf_only(
                idx._pivot_shortlist, idx._pivots[0], idx._pivots[1],
                idx.points.codes, idx.points.scales, qq, probes_n, t_n, K,
            ))
            rec = float(np.mean(
                [len(set(x) & t) / K for x, t in zip(ids, truth)]
            ))
            print(f"[{tag}] ivf-only probes={probes_n} T={t_n}: {rec:.4f}",
                  flush=True)
