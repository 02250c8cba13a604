"""Multi-host execution route (BASELINE configs 4-5): two real OS
processes, jax.distributed GRPC wiring, one global mesh, cross-process
all_gather top-k merge. The heavy lifting lives in
benchmarks/multihost_smoke.py; this test just runs it."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_sharded_query():
    env = dict(os.environ, HNSW_SMOKE_PORT="12411")
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(ROOT, "benchmarks", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert "MULTIHOST SMOKE: OK" in out.stdout, out.stdout[-2000:]
