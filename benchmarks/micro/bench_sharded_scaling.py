"""Shard-count scaling evidence for the concurrent cluster build
(VERDICT r3 #3): total WORK vs shard count on the virtual CPU mesh.

This dev box has ONE core (DEVNOTES "1-core host"), so an 8-virtual-
device mesh serializes onto it — wall-clock here measures the TOTAL
work across shards, not pod wall-clock. That is exactly the honest
scaling quantity a single machine can produce: on a real S-chip pod
each shard runs on its own chip, so projected pod wall-clock is

    total_work(S) / S     (ICI collectives excluded; the concurrent
                           build's only cross-shard op is the final
                           all_gather of per-shard results)

and the quality column shows the partition does not degrade recall.
A total_work(S)/total_work(1) ratio near (or under) 1.0 means sharding
adds no duplicated work — the projection to ~S× is then arithmetic,
not hope. Writes benchmarks/SHARDED_SCALING.json.

Run on CPU (forces an 8-device virtual host mesh):
    python benchmarks/micro/bench_sharded_scaling.py [--n 65536]
"""

import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # the 8-device virtual mesh
ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)


def main() -> None:
    import numpy as np

    from hnsw_rs_tpu import FlatIndex
    from hnsw_rs_tpu.parallel import ShardedHNSW, make_mesh
    from hnsw_rs_tpu.utils.datasets import synthetic_clustered

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--m", type=int, default=12)
    p.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    a = p.parse_args()

    ds = synthetic_clustered(a.n, a.d, n_queries=128, seed=17)
    flat = FlatIndex(a.d)
    flat.add(ds.train)
    _, truth = flat.search(ds.test, 10, exact=True)
    truth_sets = [set(t) for t in truth]

    # mirror the >=10k recall-gate test's config (tests/test_sharded_build
    # .py::test_concurrent_cluster_build_recall_at_scale): ppc=64/fanout=4
    # and a pivots budget of n/24 — n/96 pivots left no cover-fill
    # headroom over the cluster reps and measured 0.65-0.67 recall
    ck = dict(points_per_cluster=64, fanout=4, pool_p=96,
              select_alg4=False, merge_slots=24)
    rows = []
    for s in a.shards:
        mesh = make_mesh(1, s)
        # cold build pays XLA:CPU compiles for this shard count's shapes;
        # the warm rebuild is the reported work number
        for label in ("cold", "warm"):
            idx = ShardedHNSW(a.m, a.d, n_shards=s, mesh=mesh)
            t0 = time.time()
            idx.insert_bulk(ds.train, cluster_build=True, cluster_kwargs=ck)
            dt = time.time() - t0
        idx.finalize(pivots=max(64, a.n // 24))
        _, ids = idx.ann_batch(ds.test, 10, 64)
        rec = float(np.mean(
            [len(set(x) & t) / 10 for x, t in zip(ids, truth_sets)]
        ))
        row = {
            "shards": s,
            "total_work_s": round(dt, 2),
            "work_vs_1shard": None,  # filled below
            "projected_pod_wall_s": round(dt / s, 2),
            "recall@10_vs_exact": round(rec, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["total_work_s"]
    for r in rows:
        r["work_vs_1shard"] = round(r["total_work_s"] / base, 3)

    out = {
        "n": a.n, "d": a.d, "m": a.m,
        "cluster_kwargs": ck,
        "host": "1-core dev VM, 8-virtual-device XLA:CPU mesh "
                "(wall == total work across shards; see module docstring)",
        "rows": rows,
    }
    path = os.path.join(ROOT, "benchmarks", "SHARDED_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
