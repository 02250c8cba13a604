"""Heavy-tailed 1M probed-serving sweep (round-4: push the gate point
from 15.3k toward >=25k QPS @ recall>=0.99).

Loads the index cached by benchmarks/bench_second_regime.py (run that
first — it builds + saves under .bench_cache), finalizes with a DEEPER
per-pivot shortlist (default T=256; the probe-coverage matrix in
DEVNOTES says T dominates probes), then sweeps (probes, ef, max_iters):
recall on the 1024-query GT slice for every grid point, full-batch
32,768-unique-query QPS for every gate-clearing point.

Run on the real TPU:
    python benchmarks/micro/sweep_ht_serving.py [--t 256] [--probes 8,16]
        [--ladder "64:48,96:64,96:80,128:96,128:112"] [--qps-all]
"""
import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
from hnsw_rs_tpu import HNSW  # noqa: E402
from hnsw_rs_tpu.models.hnsw import _ann_seeded_probe_packed_jit  # noqa: E402
from hnsw_rs_tpu.ops.quant import dequantize, quantize  # noqa: E402
from hnsw_rs_tpu.utils.datasets import synthetic_heavy_tailed  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=1_000_000)
p.add_argument("--t", type=int, default=256)
p.add_argument("--pivots", type=int, default=32768)
p.add_argument("--cover", type=float, default=0.5)
p.add_argument("--probes", default="8,16")
p.add_argument("--ladder", default="64:48,96:64,96:80,128:96,128:112")
p.add_argument("--qps-all", action="store_true",
               help="measure QPS for every grid point, not just gated ones")
args = p.parse_args()

D, K, M, NQ, NQ_RECALL = 96, 10, 24, 32768, 1024
N = args.n
cache = os.path.join(ROOT, ".bench_cache")
idx_dir = os.path.join(cache, f"idx_ht2_n{N}_d{D}_m{M}_efc128")
gt_path = os.path.join(cache, f"gt_ht_n{N}_d{D}_q{NQ_RECALL}.npz")
if not (os.path.isdir(idx_dir) and os.path.exists(gt_path)):
    sys.exit("run benchmarks/bench_second_regime.py first (index/GT cache missing)")

ds = synthetic_heavy_tailed(N, D, n_queries=NQ, seed=42)
index = HNSW.load(idx_dir)
truth_sets = [set(t) for t in np.load(gt_path)["ids"]]

t0 = time.time()
index.finalize(pivots=args.pivots, pivot_cover=args.cover,
               pivot_shortlist=args.t)
print(f"finalize(T={args.t}) {time.time() - t0:.1f}s", flush=True)

packed0 = index._packed0
pivot_ids, pivot_vecs = index._pivots
sl_pack = index._pivot_sl_pack
T = index._pivot_shortlist.shape[1]
arrs = (packed0, pivot_ids, pivot_vecs, sl_pack)
q1k = dequantize(*quantize(jnp.asarray(ds.test[:NQ_RECALL])))
qbig = dequantize(*quantize(jnp.asarray(ds.test)))


def probed(a, q, ef, mi, probes):
    return _ann_seeded_probe_packed_jit(
        a[0], a[1], a[2], a[3], T, D, q, ef, K, mi, probes)


@functools.partial(jax.jit, static_argnames=("ef", "mi", "probes"))
def search_sum(a, q, ef, mi, probes):
    d, i = probed(a, q, ef, mi, probes)
    return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)


ladder = [tuple(int(x) for x in s.split(":")) for s in args.ladder.split(",")]
probes_list = [int(x) for x in args.probes.split(",")]
rows = []
for probes in probes_list:
    for ef, mi in ladder:
        tr = time.time()
        _, ann = probed(arrs, q1k, ef, mi, probes)
        rec = float(np.mean([
            len(set(a) & t) / K
            for a, t in zip(np.asarray(ann), truth_sets)
        ]))
        row = {"t": T, "probes": probes, "ef": ef, "mi": mi,
               "recall": round(rec, 4), "wall_s": round(time.time() - tr, 1)}
        if rec >= 0.99 or args.qps_all:
            int(search_sum(arrs, qbig, ef, mi, probes))
            tq = time.time()
            iters = 0
            while time.time() - tq < 5.0 or iters < 3:
                int(search_sum(arrs, qbig, ef, mi, probes))
                iters += 1
            row["qps"] = round(NQ * iters / (time.time() - tq), 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

out = os.path.join(ROOT, "benchmarks", "micro",
                   f"SWEEP_HT_T{T}.json")
# merge-on-write: the frontier accumulates across sweep invocations
# (grids are run in pieces); same (t, probes, ef, mi) rows are replaced
prev = []
if os.path.exists(out):
    with open(out) as f:
        prev = json.load(f).get("rows", [])
key = lambda r: (r["t"], r["probes"], r["ef"], r["mi"])  # noqa: E731
have = {key(r) for r in rows}
rows = [r for r in prev if key(r) not in have] + rows
rows.sort(key=key)
with open(out, "w") as f:
    json.dump({"rows": rows}, f, indent=2)
print(f"wrote {out}")
