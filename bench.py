"""Headline benchmark: batched HNSW query QPS at recall@10 >= 0.99 at
MILLION scale (BASELINE configs 2-3), on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by the reference's published ~300 req/s single-thread
query rate (README.md:7); the metric string also carries the measured
single-core C++ build/query rates from hnsw_rs_tpu/native/baseline_hnsw.cpp
so every x-factor has a measured denominator.

Dataset: seeded synthetic clustered vectors (SIFT-like regime; this host
has no egress, so ann-benchmarks files cannot be downloaded — the loader
for them is hnsw_rs_tpu.utils.datasets.load_ann_benchmarks_hdf5). Ground
truth is exact quantized-space top-k computed on device, matching the
reference's quality gate (hnsw/src/template.rs:531-541).

Caching: the built index and ground truth are cached under .bench_cache/
(gitignored) keyed by config, so repeat runs skip the ~2-minute build;
build throughput is (re)measured only when building fresh, and the cached
rate is reported otherwise.

Env knobs: HNSW_BENCH_N (default 1_000_000), HNSW_BENCH_QUICK=1 (100k).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import functools

    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.flat import _flat_search_tiled
    from hnsw_rs_tpu.models.hnsw import _ann_seeded_jit
    from hnsw_rs_tpu.ops.distance import point_normsq
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils.datasets import synthetic_clustered

    N = int(os.environ.get("HNSW_BENCH_N", "1000000"))
    if os.environ.get("HNSW_BENCH_QUICK"):
        N = 100_000
    # M=24/efc=128: the measured QPS-at-recall>=0.99 sweet spot at 1M
    # (benchmarks/SERVING_1M.json; a denser graph reaches the recall
    # gate in ~24 beam iterations from pivot seeds vs ~280 at M=16).
    # PIVOTS=16384: cluster builds emit ~N/96 per-cluster reps; the
    # budget must cover them or micro-regions go seedless (DEVNOTES)
    # NQ: the TIMED batch is 32,768 UNIQUE queries (duplicate-tiled
    # batches share beam paths and flatter QPS via memory locality);
    # recall is measured on the first NQ_RECALL of them against exact
    # ground truth (4k x 1M exact top-k is a few seconds of MXU, cached).
    D, K, M, EF_CONS, NQ, NQ_RECALL, PIVOTS = 96, 10, 24, 128, 32768, 4096, 16384
    cache = os.path.join(ROOT, ".bench_cache")
    tag = f"n{N}_d{D}_m{M}_efc{EF_CONS}"
    idx_dir = os.path.join(cache, f"idx_{tag}")
    # graph-independent; keyed by query count (unique-query batch, r4)
    gt_path = os.path.join(cache, f"gt_n{N}_d{D}_q{NQ_RECALL}.npz")
    meta_path = os.path.join(cache, f"meta_{tag}.json")
    os.makedirs(cache, exist_ok=True)

    ds = synthetic_clustered(N, D, n_queries=NQ, seed=42)

    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    # Build-code version: the quoted range is a range over fresh builds
    # OF THE SAME BUILDER. When the build path materially changes (e.g.
    # the round-5 fused-kmeans single-dispatch pipeline), mixing old-code
    # runs into the range would misreport both; archive them and start a
    # new list. Bump BUILD_CODE_V on any change that alters build cost.
    BUILD_CODE_V = 2  # v2: build_cluster.kmeans fused into one jit
    if meta.get("build_code_v", 1) != BUILD_CODE_V:
        if meta.get("build_rate_runs"):
            meta[f"build_rate_runs_v{meta.get('build_code_v', 1)}"] = (
                meta.pop("build_rate_runs")
            )
        meta.pop("build_rate", None)  # force a rebuild: cache is old-code
        meta["build_code_v"] = BUILD_CODE_V

    # HNSW_BENCH_FRESH=1 forces a fresh (cold+warm) build even when the
    # cached index exists: every warm rate lands in meta["build_rate_runs"],
    # which is how the committed build-rate RANGE accumulates history
    # across sessions (tunnel/host throughput swings ~2-7x — DEVNOTES).
    fresh = bool(os.environ.get("HNSW_BENCH_FRESH"))
    if os.path.isdir(idx_dir) and "build_rate" in meta and not fresh:
        index = HNSW.load(idx_dir)
        build_rate = meta["build_rate"]
    else:
        def timed_build():
            t0 = time.time()
            idx = HNSW(M, ef_cons=EF_CONS, dim=D)
            # cluster-bulk build (build_cluster.py): the measured-fastest
            # builder — wave-free, recall-gated by this very benchmark's
            # >=0.99 serving gate below
            # pool_p/fanout: the measured build-rate frontier at unchanged
            # serving recall (benchmarks/micro/bench_build_cfg ladder,
            # DEVNOTES "cluster-build config sweep"): 256/12 -> 9,014
            # vec/s; 96/5 -> 23,211 vec/s (2.6x) at the same 0.9977
            # recall@10 (ef=16/mi=8) on this regime. kmeans_iters=2
            # was measured NO faster (tunnel variance) and costs margin.
            # select_alg4=False: nearest-m select, ALL diversity pruning
            # left to the merge union chain — select phase 11.0 -> 4.2 s
            # at 1M (layer-0 stage total 38.8 -> 32.4 s) and the 1M gate
            # ladder is unchanged-or-better (0.9988 @ ef=16/mi=8 vs
            # 0.9977; 1.0000 from ef=40) — DEVNOTES "select_alg4".
            # merge_slots=48 (= cap, vs the 2*cap default): incoming
            # reverse-edge slots in the merge union; mean in-degree is m,
            # so halving slots only truncates hub rows (d2-worst incoming
            # drop first). Same-session A/B at 1M: merge 10.9 -> 7.5 s,
            # layer-0 27.9 -> 26.1 s, recall 0.9992 @ ef=16/mi=8 (vs
            # 0.9988 at slots=96) — DEVNOTES "cluster-build config sweep".
            idx.insert_bulk(
                ds.train, cluster_build=True,
                cluster_kwargs={"pool_p": 96, "points_per_cluster": 96,
                                "fanout": 5, "select_alg4": False,
                                "merge_slots": 48},
            )
            for a in idx.graph.adjs:  # force completion via tiny checksums
                int(jnp.sum(jnp.abs(a) % 7))
            return idx, time.time() - t0

        index, first_s = timed_build()  # pays remote compiles when cold
        index, build_s = timed_build()  # compile-cache warm: real rate
        build_rate = N / build_s
        index.save(idx_dir)
        meta["build_rate"] = build_rate
        meta["build_s"] = build_s
        meta["build_s_cold"] = first_s
        # per-fresh-build rate history: tunnel/host throughput swings
        # ~2-7x between sessions (DEVNOTES), so the committed number is
        # a RANGE over fresh builds, never one run
        meta.setdefault("build_rate_runs", []).append(round(build_rate, 1))

    # single-core CPU baseline (measured on a 50k slice; the full-N
    # sequential build would take hours of bench budget). Rates fall
    # slowly with N, so a 50k-slice rate FLATTERS the baseline — fine.
    # CAUTION: this host has ONE core (nproc=1); any concurrent python
    # process (pytest, another bench) halves-to-tenths this measurement
    # and silently INFLATES the reported x-factor. Idle-measured truth
    # at M=24/efc=128/d=96: ~940 vec/s (2 trials within 0.4%).
    if "cpu_build_vps" not in meta:
        from hnsw_rs_tpu.native import baseline_build_rate

        nb = min(N, 50_000)
        r = baseline_build_rate(ds.train[:nb], m=M, ef_cons=EF_CONS)
        meta["cpu_build_vps"] = round(r[1], 1) if r else None
        meta["cpu_build_n"] = nb
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    # exact quantized-space ground truth (cached)
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

    index.finalize(pivots=PIVOTS)  # packed rows + pivot-seeded serving
    packed0 = index._packed0
    pivot_ids, pivot_vecs = index._pivots
    truth_sets = [set(t) for t in truth]
    q1k = dequantize(*quantize(jnp.asarray(ds.test[:NQ_RECALL])))

    # cheapest (ef, max_iters) clearing the 0.99 recall gate, in
    # ascending cost order (cost ~ max_iters; see DEVNOTES gather floor)
    cands = [
        (16, 8), (24, 10), (24, 12), (32, 16), (40, 20), (40, 24),
        (48, 24), (48, 28), (48, 32), (64, 40), (64, 56), (96, 80),
        (128, 112), (192, 200), (256, 280),
    ]
    chosen = None
    for ef, mi in cands:
        _, ann = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q1k,
                                 ef, K, mi, 1)
        recall = float(
            np.mean([len(set(a) & t) / K for a, t in zip(np.asarray(ann),
                                                         truth_sets)])
        )
        if recall >= 0.99:
            chosen = (ef, mi, recall)
            break
    gate_met = chosen is not None
    if not gate_met:
        # never report a sub-gate recall under a ">=0.99" label: the
        # metric string below switches to BELOW-GATE and vs_baseline is
        # zeroed so a silent quality regression cannot masquerade as a
        # healthy headline
        chosen = (ef, mi, recall)
    ef, max_iters, recall = chosen

    # NB: big arrays must be jit ARGUMENTS — closure capture bakes them
    # into the HLO as constants and the dev tunnel's remote compiler
    # rejects the multi-GB request body (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("ef", "k", "mi"))
    def search_sum(packed0, pivot_ids, pivot_vecs, q, ef, k, mi):
        d, i = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q, ef, k, mi)
        return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)

    batch = NQ  # 32,768 unique queries — no duplicate tiling
    q = dequantize(*quantize(jnp.asarray(ds.test)))

    args = (packed0, pivot_ids, pivot_vecs, q)
    int(search_sum(*args, ef, K, max_iters))  # compile + warm
    t0 = time.time()
    iters = 0
    while time.time() - t0 < 5.0 or iters < 3:
        int(search_sum(*args, ef, K, max_iters))
        iters += 1
    qps = batch * iters / (time.time() - t0)

    cpu_bv = meta.get("cpu_build_vps")
    # The denominator is pinned to the cross-session MAX of idle
    # measurements: this VM's CPU state itself swings ~3x between
    # sessions (idle trials of the SAME M=24/efc=128/d=96 baseline:
    # 939.9/936.8 one session, 313.6/317.7 another — DEVNOTES "baseline
    # measurement honesty"). The C++ baseline is 100% host-bound while
    # the TPU build is only partly host-bound, so a slow-host session
    # INFLATES the same-session x-factor; max() keeps the reported
    # multiple conservative no matter which host state measured it.
    # The floor is scoped to THIS dev VM (1-core Xeon @2.10GHz): on any
    # other host the locally-measured rate stands on its own — a faster
    # host must not inherit a slower machine's calibration (which would
    # overstate the x-factor) and vice versa.
    CPU_BASELINE_FLOOR = 939.9  # best idle cross-session measurement
    FLOOR_HOST = (1, "Intel(R) Xeon(R) Processor @ 2.10GHz")
    try:
        with open("/proc/cpuinfo") as f:
            model = next(
                (ln.split(":", 1)[1].strip() for ln in f
                 if ln.startswith("model name")), "")
        this_host = (os.cpu_count(), model)
    except OSError:
        this_host = None
    if cpu_bv and this_host == FLOOR_HOST:
        cpu_bv = max(cpu_bv, CPU_BASELINE_FLOOR)
    bx = f", {build_rate / cpu_bv:.1f}x 1-core C++ {cpu_bv:.0f}" if cpu_bv else ""
    runs = meta.get("build_rate_runs", [])
    if cpu_bv and len(runs) >= 2:
        bx += (f" [range {min(runs):.0f}-{max(runs):.0f} vec/s = "
               f"{min(runs)/cpu_bv:.1f}-{max(runs)/cpu_bv:.1f}x over "
               f"{len(runs)} fresh builds]")
    # serving-memory honesty: device bytes per point actually held by this
    # serving mode (packed rows + pivot table + codes/scales/adjacency)
    serve_bytes = int(packed0.size + pivot_vecs.size * 4 + pivot_ids.size * 4
                      + N * D + N * 8)
    for a in index.graph.adjs:
        serve_bytes += N * a.shape[1] * 4
    bpp = serve_bytes / N
    gate_label = "recall@10>=0.99" if gate_met else "recall@10 BELOW GATE 0.99"
    print(
        json.dumps(
            {
                "metric": (
                    f"QPS/chip at {gate_label}, N={N} d={D} synthetic-"
                    f"clustered (M={M}, pivot-seeded ef={ef} "
                    f"mi={max_iters}, recall={recall:.3f}, "
                    f"{bpp:.0f} B/point serving memory; build "
                    f"{build_rate:.0f} vec/s{bx} vec/s)"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": 0.0 if not gate_met else round(qps / 300.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
