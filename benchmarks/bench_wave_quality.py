"""Build-knob sweep at scale: (wave_cap, build_expand) vs build rate and
graph quality at N >= 1M.

- ``wave_cap`` bounds lockstep wave size: intra-wave blindness grows with
  the cap, so recall flat across caps bounds the wave-parallelism penalty
  from above. (A true W=1 build at 1M is ~1M dispatches x 33 ms = days on
  the dev tunnel; the W=1 cross-check at small N lives in
  tests/test_sharded_build.py and DEVNOTES "Algorithmic notes".)
- ``build_expand`` pops E>1 beam entries per construction-search
  iteration (superset discovery, ~E× fewer iterations — the build-
  throughput knob; see search._beam_loop).

Builds the same dataset at each config and measures recall@10 against
exact (quantized-space) ground truth over an ef sweep, plus build vec/s.

Run: python benchmarks/bench_wave_quality.py [--quick] [--n 1000000]
Results land in WAVE_QUALITY.json next to this file.
"""

import functools
import json
import os
import sys
import time

from common import setup_jax

QUICK = "--quick" in sys.argv
jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.models.flat import _flat_search_tiled
from hnsw_rs_tpu.ops.distance import point_normsq
from hnsw_rs_tpu.ops.quant import dequantize, quantize
from hnsw_rs_tpu.utils.datasets import synthetic_clustered

N = 100_000 if QUICK else 1_000_000
if "--n" in sys.argv:
    N = int(sys.argv[sys.argv.index("--n") + 1])
D, K, NQ, M, EF_CONS = 96, 10, 1024, 16, 96
# (wave_cap, build_expand): caps axis = wave-blindness bound;
# expand axis = throughput knob
CONFIGS = [(1024, 1), (4096, 1), (4096, 4)] if QUICK else [
    (512, 1), (2048, 1), (4096, 1), (8192, 1), (4096, 2),
]

ds = synthetic_clustered(N, D, n_queries=NQ, seed=42)

results = {"n": N, "d": D, "m": M, "ef_cons": EF_CONS, "configs": []}

# exact quantized-space ground truth (once)
codes, scales = quantize(jnp.asarray(ds.train))
normsq = point_normsq(codes, scales)
q = dequantize(*quantize(jnp.asarray(ds.test)))
_, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
    q, codes, scales, normsq
)
truth = [set(t) for t in np.asarray(ti)[:, :K]]
del codes, scales, normsq, q
print(f"N={N} d={D}: ground truth done", flush=True)

for cap, expand in CONFIGS:
    t0 = time.time()
    index = HNSW(M, ef_cons=EF_CONS, dim=D)
    index.insert_bulk(ds.train, wave_cap=cap, build_expand=expand)
    for a in index.graph.adjs:
        int(jnp.sum(jnp.abs(a) % 7))  # on-device checksum sync
    dt = time.time() - t0
    index.finalize()
    row = {
        "wave_cap": cap, "build_expand": expand,
        "build_s": round(dt, 1), "vps": round(N / dt, 1), "recall": {},
    }
    for ef in (16, 32, 64, 128):
        _, ann = index.ann_batch(ds.test, K, ef)
        rec = float(np.mean([len(set(a) & t) / K for a, t in zip(ann, truth)]))
        row["recall"][ef] = round(rec, 4)
    results["configs"].append(row)
    print(row, flush=True)
    del index

out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "WAVE_QUALITY.json")
with open(out, "w") as f:
    json.dump(results, f, indent=2)
print(f"wrote {out}", flush=True)
