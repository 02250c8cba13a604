"""Two-process multi-host smoke test of the sharded query path.

Spawns two OS processes, each with a 4-device virtual CPU backend,
wires them with jax.distributed (GRPC coordinator on localhost), forms
one global (data=1, shard=8) mesh spanning both processes, assembles
the sharded index state from per-process local rows, runs the full
``sharded_query`` (shard_map beam search + all_gather top-k merge whose
collectives now cross the process boundary), and asserts exact
self-matches. This is the execution route for BASELINE configs 4-5;
on a real multi-host pod only the initialize() arguments change.

Run: python benchmarks/multihost_smoke.py
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PORT = int(os.environ.get("HNSW_SMOKE_PORT", "12367"))


def worker(pid: int) -> None:
    from hnsw_rs_tpu.parallel.multihost import (
        global_mesh, init_distributed, shard_from_local,
    )

    init_distributed(
        coordinator_address=f"localhost:{PORT}",
        num_processes=2,
        process_id=pid,
        local_device_count=4,
    )
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    assert len(jax.devices()) == 8, jax.devices()
    assert jax.process_count() == 2

    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.parallel.sharded import sharded_query

    mesh = global_mesh(n_data=1, n_shard=8)
    S, K, d, m = 8, 16, 8, 4
    cap = 2 * m
    rng = np.random.default_rng(0)  # same data on both processes (seeded)
    vecs = rng.random((S, K, d)).astype(np.float32)
    codes, scales = (np.asarray(x) for x in quantize(jnp.asarray(vecs)))
    # ring adjacency per shard: every node reachable from entry 0
    adj = np.full((S, K, cap), -1, np.int32)
    for off_i, off in enumerate((-2, -1, 1, 2)):
        adj[:, :, off_i] = (np.arange(K)[None, :] + off) % K
    gids = np.arange(S * K, dtype=np.int32).reshape(S, K)
    eps = np.zeros((S,), np.int32)

    lo, hi = pid * 4, (pid + 1) * 4  # this process's shard rows
    sh = lambda x: shard_from_local(mesh, P("shard"), x[lo:hi])
    adj_g = sh(adj)
    codes_g, scales_g = sh(codes), sh(scales)
    gids_g, eps_g = sh(gids), sh(eps)

    nq = 8
    q = np.asarray(dequantize(*quantize(jnp.asarray(vecs[0, :nq]))))
    q_g = shard_from_local(mesh, P("data"), q)  # data axis = 1: replicated

    import functools

    run = jax.jit(
        functools.partial(sharded_query, mesh),
        static_argnames=("ef", "k", "max_iters"),
    )
    d2, ids = run(
        (adj_g,), codes_g, scales_g, gids_g, eps_g, q_g,
        ef=16, k=5, max_iters=64,  # ef = K: beam covers the whole sub-graph (exact)
    )
    from jax.experimental import multihost_utils

    ids_h = np.asarray(multihost_utils.process_allgather(ids, tiled=True))
    ids_h = ids_h.reshape(-1, 5)[:nq]
    assert np.array_equal(ids_h[:, 0], np.arange(nq)), ids_h[:, 0]
    print(f"process {pid}: multihost sharded_query ok, self-match {nq}/{nq}",
          flush=True)


def main() -> int:
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    rc = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = "\n".join(out.strip().splitlines()[-5:])
        print(f"--- process {pid} (rc={p.returncode}) ---\n{tail}")
        rc |= p.returncode
    print("MULTIHOST SMOKE:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(main())
