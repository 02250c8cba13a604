"""Second committed 1M serving regime (round-3 hardening, round-4
first-class): QPS at recall@10 >= 0.99 on synthetic-HEAVY-TAILED data
(Zipf cluster sizes, per-cluster scale spread, 20% tail queries) so the
headline number is not single-distribution. Measures BOTH serving modes
on the same build:

  packed+pivots         — pivot-seeded beam (bench.py's headline mode)
  packed+pivots+probed  — + per-pivot top-T shortlists entering the beam
                          at iteration 0 (finalize(pivot_shortlist=T)):
                          the round-4 fix for this regime's measured
                          pathology (recall was a function of max_iters
                          alone — misses are candidates the beam never
                          WALKS to behind a shell of closer dense
                          expansions; probing makes them beam members
                          instead of walk targets)
  packed+pivots+probed-narrow — same probe semantics via the int32
                          shortlist + narrow gathers against the base
                          codes (no packed shortlist table): the
                          memory-honest probed variant. Every row now
                          carries serve_bytes_per_point / mem_x_raw.

Build config = bench.py's headline cluster build (the config sweep
generalizes: measured 49.7k vec/s on this regime, round 4). The build
rate is quoted as the RANGE of all fresh-build runs recorded in the
meta file (tunnel throughput swings ~2x between sessions — DEVNOTES).

GATE: exits 1 if no mode clears recall >= 0.99 (--no-gate to disable),
so a quality regression on this regime fails loudly in CI-style runs.

Writes benchmarks/SERVING_REGIMES.json (one row per mode).
Run on the real TPU: python benchmarks/bench_second_regime.py [--quick]
"""

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# T=256/probes=36 at ef=40/mi=28: the measured heavy-tailed gate
# frontier (benchmarks/micro/SWEEP_HT_T256.json, 33-point grid): the
# r4 config (T=128/probes=32) gated at 15.3k QPS; T dominates probes
# (DEVNOTES probe-coverage matrix) and the approx probe-merge (r5,
# search._top_ef_dedup_oversampled) pays for the wider rows
PIVOTS, COVER, SHORTLIST, PROBES = 32768, 0.5, 256, 36
CLUSTER_KWARGS = {"pool_p": 96, "points_per_cluster": 96, "fanout": 5,
                  "select_alg4": False, "merge_slots": 48}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.flat import _flat_search_tiled
    from hnsw_rs_tpu.models.hnsw import (
        _ann_seeded_jit,
        _ann_seeded_probe_jit,
        _ann_seeded_probe_packed_jit,
    )
    from hnsw_rs_tpu.ops.distance import point_normsq
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils.datasets import synthetic_heavy_tailed

    N = 100_000 if "--quick" in sys.argv else int(os.environ.get("HNSW_BENCH_N", "1000000"))
    # NQ: the timed batch is 32,768 UNIQUE queries (duplicate-tiled
    # batches share beam paths and flatter QPS); recall is gated on the
    # first NQ_RECALL against exact ground truth.
    D, K, M, EF_CONS, NQ, NQ_RECALL = 96, 10, 24, 128, 32768, 1024
    cache = os.path.join(ROOT, ".bench_cache")
    # r4 tag: keyed by build config so the round-3 cached index (pp=256,
    # alg4) cannot silently serve this round's numbers
    tag = f"ht2_n{N}_d{D}_m{M}_efc{EF_CONS}"
    idx_dir = os.path.join(cache, f"idx_{tag}")
    gt_path = os.path.join(cache, f"gt_ht_n{N}_d{D}_q{NQ_RECALL}.npz")
    meta_path = os.path.join(cache, f"meta_{tag}.json")
    os.makedirs(cache, exist_ok=True)

    ds = synthetic_heavy_tailed(N, D, n_queries=NQ, seed=42)

    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    # warm-rate history is per BUILDER VERSION (see bench.py): archive
    # runs measured by older build code instead of mixing ranges
    BUILD_CODE_V = 2  # v2: build_cluster.kmeans fused into one jit
    if meta.get("build_code_v", 1) != BUILD_CODE_V:
        if meta.get("build_vps_runs"):
            meta[f"build_vps_runs_v{meta.get('build_code_v', 1)}"] = (
                meta.pop("build_vps_runs")
            )
        meta["build_code_v"] = BUILD_CODE_V

    def timed_build():
        t0 = time.time()
        idx = HNSW(M, ef_cons=EF_CONS, dim=D)
        idx.insert_bulk(ds.train, cluster_build=True,
                        cluster_kwargs=CLUSTER_KWARGS)
        for a in idx.graph.adjs:
            int(jnp.sum(jnp.abs(a) % 7))
        return idx, N / (time.time() - t0)

    if (os.path.isdir(idx_dir) and meta.get("build_vps_runs")
            and "--fresh" not in sys.argv):
        index = HNSW.load(idx_dir)
    else:
        # Every building PROCESS builds twice: the first build pays
        # whatever this process is cold on — remote XLA compiles on a
        # cold disk cache (measured 1,082 vec/s: pure compiler latency,
        # not build throughput) or just cache loading on a warm one —
        # and is recorded to cold_build_vps only. The second build
        # reuses every program compiled in-process, so ONLY its rate
        # enters the warm-only build_vps_runs range the committed rows
        # quote. (Gating the double-build on meta history instead let a
        # cold rate leak into the warm list — round-4 advisor finding.)
        # `--fresh` forces a rebuild over a cached index so warm-run
        # history accumulates across sessions.
        index, rate = timed_build()
        meta.setdefault("cold_build_vps", []).append(round(rate, 1))
        index, rate = timed_build()
        meta.setdefault("build_vps_runs", []).append(round(rate, 1))
        index.save(idx_dir)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
    runs = meta["build_vps_runs"]

    if os.path.exists(gt_path):
        truth = np.load(gt_path)["ids"]
    else:
        qq = dequantize(*quantize(jnp.asarray(ds.test[:NQ_RECALL])))
        normsq = point_normsq(index.points.codes, index.points.scales)
        _, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
            qq, index.points.codes, index.points.scales, normsq
        )
        truth = np.asarray(ti)[:, :K]
        np.savez_compressed(gt_path, ids=truth)
    truth_sets = [set(t) for t in truth]

    index.finalize(pivots=PIVOTS, pivot_cover=COVER,
                   pivot_shortlist=SHORTLIST)
    packed0 = index._packed0
    pivot_ids, pivot_vecs = index._pivots
    sl_pack = index._pivot_sl_pack
    q1k = dequantize(*quantize(jnp.asarray(ds.test[:NQ_RECALL])))
    qbig = dequantize(*quantize(jnp.asarray(ds.test)))

    # NB: the big serving arrays ride as jit ARGUMENTS everywhere below
    # (closure capture bakes them into the HLO as constants and the dev
    # tunnel's remote compiler rejects multi-GB bodies — DEVNOTES 413)
    def seeded(a, q, ef, mi):
        return _ann_seeded_jit(a[0], a[1], a[2], q, ef, K, mi)

    def probed(a, q, ef, mi):
        return _ann_seeded_probe_packed_jit(
            a[0], a[1], a[2], a[3], SHORTLIST, D, q, ef, K, mi, PROBES,
        )

    def probed_narrow(a, q, ef, mi):
        # memory-honest probed variant: probes the int32 shortlist with
        # per-member narrow gathers against the base codes/scales the
        # index already holds — no 453 MB packed shortlist table
        # (search.ann_search_seeded_probe vs ..._probe_packed)
        return _ann_seeded_probe_jit(
            a[0], a[1], a[2], a[4], a[5], a[6], q, ef, K, mi, PROBES,
        )

    shortlist = index._pivot_shortlist
    arrs = (packed0, pivot_ids, pivot_vecs, sl_pack, shortlist,
            index.points.codes, index.points.scales)

    # serving-memory honesty (VERDICT r4): device bytes actually held by
    # each mode — packed rows + pivot table + codes/scales + adjacency,
    # plus the mode's probe structure (packed shortlist rows vs the
    # narrow int32 shortlist). mem_x_raw divides by N*D*4 raw f32.
    base_bytes = int(packed0.size + pivot_vecs.size * 4
                     + pivot_ids.size * 4 + N * D + N * 8)
    for a_ in index.graph.adjs:
        base_bytes += N * a_.shape[1] * 4
    mode_bytes = {
        "packed+pivots+probed": base_bytes + int(sl_pack.size),
        "packed+pivots+probed-narrow": base_bytes + int(shortlist.size) * 4,
        "packed+pivots": base_bytes,
    }

    cands = [(40, 24), (40, 28), (48, 28), (48, 32), (64, 40), (64, 56),
             (96, 80), (128, 112), (192, 200), (256, 280), (384, 500),
             (512, 700)]

    rows_new = []
    for mode, fn in (("packed+pivots+probed", probed),
                     ("packed+pivots+probed-narrow", probed_narrow),
                     ("packed+pivots", seeded)):
        chosen = None
        for ef, mi in cands:
            _, ann = fn(arrs, q1k, ef, mi)
            rec = float(np.mean([
                len(set(a) & t) / K
                for a, t in zip(np.asarray(ann), truth_sets)
            ]))
            print(f"{mode} ef={ef} mi={mi} recall={rec:.4f}", flush=True)
            if rec >= 0.99:
                chosen = (ef, mi, rec)
                break
        gate_met = chosen is not None
        if not gate_met:
            chosen = (ef, mi, rec)
        ef, mi, rec = chosen

        @functools.partial(jax.jit, static_argnames=("ef", "mi"))
        def search_sum(a, q, ef, mi):
            d, i = fn(a, q, ef, mi)
            return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)

        int(search_sum(arrs, qbig, ef, mi))
        t0 = time.time()
        iters = 0
        while time.time() - t0 < 5.0 or iters < 3:
            int(search_sum(arrs, qbig, ef, mi))
            iters += 1
        qps = NQ * iters / (time.time() - t0)
        rows_new.append({
            "regime": "heavy-tailed",
            "n": N, "d": D, "m": M, "ef_cons": EF_CONS,
            "mode": mode, "pivots": int(pivot_ids.shape[0]),
            "pivot_cover": COVER,
            "shortlist": SHORTLIST if "probed" in mode else 0,
            "probes": PROBES if "probed" in mode else 0,
            "ef": ef, "max_iters": mi,
            "recall": round(rec, 4), "gate_met": gate_met,
            "qps": round(qps, 1),
            "serve_bytes_per_point": round(mode_bytes[mode] / N, 1),
            "mem_x_raw": round(mode_bytes[mode] / (N * D * 4), 2),
            "build_vps_range": [min(runs), max(runs)],
            "build_runs": len(runs),
        })
        print(json.dumps(rows_new[-1]), flush=True)

    out_path = os.path.join(ROOT, "benchmarks", "SERVING_REGIMES.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f).get("rows", [])
    rows = [r for r in rows if r.get("regime") != "heavy-tailed"] + rows_new
    with open(out_path, "w") as f:
        json.dump({"rows": rows}, f, indent=2)
    print(f"wrote {out_path}")

    if "--no-gate" not in sys.argv and not any(
        r["gate_met"] for r in rows_new
    ):
        print("GATE FAILED: no serving mode reached recall@10 >= 0.99 "
              "on the heavy-tailed regime", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
