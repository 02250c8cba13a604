"""Bisect the l2_groupmin Mosaic compile hang (DEVNOTES "Pallas groupmin
kernel status"): each variant compiles in its OWN subprocess under a hard
timeout, so a hang marks the variant and moves on. Run on the real TPU:

    python benchmarks/micro/pallas_bisect.py [timeout_s]

Variants isolate: grid size, the 3-D reshape/group-reduce, the argmin id
tracking, a reshape-free strided tree-reduce, and explicit
dimension_semantics.
"""
import os
import subprocess
import sys

TIMEOUT = int(sys.argv[1]) if len(sys.argv) > 1 else 180
ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRELUDE = r"""
import os, sys
sys.path.insert(0, "{ROOT}")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
GROUP, TQ, TN = 128, 256, 2048
B, N, D = {B}, {N}, 96
rng = np.random.default_rng(0)
q = jnp.asarray(rng.random((B, D), np.float32))
codes = jnp.asarray(rng.integers(0, 255, (N, D), np.uint8))
scales = jnp.asarray(np.stack([rng.random(N), rng.random(N) * 0.01], 1).astype(np.float32))
normsq = jnp.asarray(rng.random((N,), np.float32))

def run(kernel, n_out=2, out_shapes=None, **kw):
    grid = (B // TQ, N // TN)
    gout = TN // GROUP
    if out_shapes is None:
        out_shapes = [jax.ShapeDtypeStruct((N // GROUP, B), jnp.float32),
                      jax.ShapeDtypeStruct((N // GROUP, B), jnp.int32)][:n_out]
        out_specs = [pl.BlockSpec((gout, TQ), lambda i, j: (j, i), memory_space=pltpu.VMEM)
                     for _ in range(n_out)]
    else:
        out_specs = kw.pop("out_specs")
    f = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs, out_shape=out_shapes, **kw,
    )
    out = f(q, codes, scales, normsq.reshape(N, 1))
    leaves = jax.tree.leaves(out)
    print("OK", [int(jnp.sum(jnp.abs(x).astype(jnp.float32)) % 97) for x in leaves])

def dist(q_ref, codes_ref, scales_ref, normsq_ref):
    qq = q_ref[...]
    c = codes_ref[...].astype(jnp.int32).astype(jnp.float32)
    cdotq = jax.lax.dot_general(c, qq, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mn = scales_ref[:, 0][:, None]
    delta = scales_ref[:, 1][:, None]
    qsum = jnp.sum(qq, axis=1)[None, :]
    qsq = jnp.sum(qq * qq, axis=1)[None, :]
    return jnp.maximum(
        qsq + normsq_ref[:, 0][:, None] - 2.0 * (delta * cdotq + mn * qsum), 0.0)
"""

VARIANTS = {
    # the known-hanging config, as-is
    "current_full": """
from hnsw_rs_tpu.ops.pallas.l2_groupmin import group_min_d2
o = group_min_d2(q, codes, scales, normsq)
print("OK", int(jnp.sum(o[0]) % 97))
""",
    # single grid cell: does a 1x1 grid compile?
    "current_1cell": """
from hnsw_rs_tpu.ops.pallas.l2_groupmin import group_min_d2
o = group_min_d2(q[:256], codes[:2048], scales[:2048], normsq[:2048])
print("OK", int(jnp.sum(o[0]) % 97))
""",
    # distances only, full [TN, TQ] block store (no reshape/reduce)
    "dist_only": """
def k(q_ref, codes_ref, scales_ref, normsq_ref, out_ref):
    out_ref[...] = dist(q_ref, codes_ref, scales_ref, normsq_ref)
run(k, out_shapes=[jax.ShapeDtypeStruct((N, B), jnp.float32)],
    out_specs=[pl.BlockSpec((TN, TQ), lambda i, j: (j, i), memory_space=pltpu.VMEM)])
""",
    # group-min via 3-D reshape, NO id tracking
    "gmin_noid": """
def k(q_ref, codes_ref, scales_ref, normsq_ref, outd_ref):
    d2 = dist(q_ref, codes_ref, scales_ref, normsq_ref)
    g = TN // GROUP
    outd_ref[...] = jnp.min(d2.reshape(g, GROUP, d2.shape[1]), axis=1)
run(k, n_out=1)
""",
    # reshape-free tree-reduce via stride-2 row slices, with id tracking
    "tree_reduce": """
def k(q_ref, codes_ref, scales_ref, normsq_ref, outd_ref, outi_ref):
    d2 = dist(q_ref, codes_ref, scales_ref, normsq_ref)
    base = pl.program_id(1) * TN
    idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0) + base
    while d2.shape[0] > TN // GROUP:
        a_d, b_d = d2[0::2], d2[1::2]
        a_i, b_i = idx[0::2], idx[1::2]
        take_b = (b_d < a_d) | ((b_d == a_d) & (b_i < a_i))
        d2 = jnp.where(take_b, b_d, a_d)
        idx = jnp.where(take_b, b_i, a_i)
    outd_ref[...] = d2
    outi_ref[...] = idx
run(k)
""",
    # current kernel + explicit parallel/arbitrary dimension semantics
    "dimsem": """
def k(q_ref, codes_ref, scales_ref, normsq_ref, outd_ref, outi_ref):
    d2 = dist(q_ref, codes_ref, scales_ref, normsq_ref)
    tq = d2.shape[1]
    base = pl.program_id(1) * TN
    g = TN // GROUP
    d3 = d2.reshape(g, GROUP, tq)
    gmin3 = jnp.min(d3, axis=1)
    row3 = jax.lax.broadcasted_iota(jnp.int32, (g, GROUP, tq), 1)
    amin3 = jnp.min(jnp.where(d3 == gmin3[:, None, :], row3, GROUP), axis=1)
    off = jax.lax.broadcasted_iota(jnp.int32, (g, tq), 0) * GROUP
    outd_ref[...] = gmin3
    outi_ref[...] = base + off + amin3
run(k, compiler_params=pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary")))
""",
}


def main() -> None:
    big = dict(B=512, N=131072)
    small = dict(B=256, N=2048)
    results = {}
    for name, body in VARIANTS.items():
        shapes = small if name == "current_1cell" else big
        src = (
            PRELUDE.replace("{B}", str(shapes["B"]))
            .replace("{N}", str(shapes["N"]))
            .replace("{ROOT}", ROOT)
        ) + body
        try:
            p = subprocess.run(
                [sys.executable, "-c", src], capture_output=True, text=True,
                timeout=TIMEOUT,
            )
            ok = "OK" in p.stdout
            results[name] = "COMPILED+RAN" if ok else f"FAILED rc={p.returncode}"
            if not ok:
                tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
                results[name] += " | " + " / ".join(tail)
        except subprocess.TimeoutExpired:
            results[name] = f"HUNG (> {TIMEOUT}s)"
        print(f"{name:>14s}: {results[name]}", flush=True)


if __name__ == "__main__":
    main()
