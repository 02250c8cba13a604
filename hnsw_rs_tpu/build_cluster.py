"""Cluster-bulk layer-0 construction (``insert_bulk(cluster_build=True)``).

The wave builder's throughput ceiling is the construction beam search: a
lockstep ``while_loop`` that runs to its iteration cap for every query
(DEVNOTES "the construction beam loop RUNS TO ITS CAP") and costs
~sequential-depth x dispatch no matter how good the seeds are. At BULK
build time the graph is not needed to FIND candidate neighbors — the
dataset itself is: this module replaces the per-wave beam searches with

1. device k-means over the dataset (a few Lloyd iterations; assignment
   is one MXU matmul per chunk, centroid update a row scatter-add);
2. per-cluster DENSE candidate pools: each point's pool is the members
   of its cluster's ``fanout`` nearest clusters, scored against the
   whole cluster's members with ONE batched MXU matmul (the per-cluster
   member tables are disjoint, so pools carry no duplicates and need no
   dedup sort — the wave path's measured pool-build wall);
3. the SAME oracle-pinned Algorithm-4 accept chain
   (``heuristic._accept_from_pool``) and the SAME apply/repair machinery
   (``build._apply_wave_impl`` with its in-degree protection + orphan
   repair) as the wave builder, one fused donated dispatch per cluster
   group.

Graph SEMANTICS differ from the wave build exactly the way any
insertion-order change does (and cluster mates CAN select each other,
which lockstep waves cannot); quality is therefore recall-GATED by the
benchmarks (``benchmarks/micro/bench_build_cfg.py --cluster``), not
structure-pinned. Upper layers (a few % of points) still use the exact
wave path — they are where reference navigation semantics live
(``hnsw/src/template.rs:403-440``); this module is the bulk-throughput
analogue of the reference's parallel insert fan-out at
``template.rs:388-445``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .heuristic import _accept_from_pool
from .ops.distance import l2sq
from .ops.quant import dequantize
from .ops.topk import INF, PAD_ID, sort_dist_id

__all__ = ["kmeans", "build_layer0_clustered"]


# ---------------------------------------------------------------------------
# device k-means


@functools.partial(jax.jit, static_argnames=("chunk",))
def _lloyd_iter(codes, scales, cent, chunk: int):
    """One Lloyd iteration, chunked over points: returns (new centroids,
    assignment against the INPUT centroids). Assignment is argmax of
    ``x.c - |c|^2/2`` (ordering-equal to argmin ``|x-c|^2``; ties ->
    lowest cluster id, deterministic). Empty clusters keep their old
    centroid."""
    n, d = codes.shape
    k = cent.shape[0]
    npad = -(-n // chunk) * chunk
    ids = jnp.arange(npad, dtype=jnp.int32).reshape(-1, chunk)
    half_c2 = 0.5 * jnp.sum(cent * cent, axis=1)  # [K]

    def step(carry, idc):
        sums, cnts = carry
        valid = idc < n
        safe = jnp.clip(idc, 0, n - 1)
        vec = dequantize(codes[safe], scales[safe])  # [chunk, d]
        score = (
            jnp.dot(vec, cent.T, preferred_element_type=jnp.float32)
            - half_c2[None, :]
        )
        a = jnp.argmax(score, axis=1).astype(jnp.int32)
        a = jnp.where(valid, a, k)  # pad rows -> dropped
        sums = sums.at[a].add(vec, mode="drop")
        cnts = cnts.at[a].add(1, mode="drop")
        return (sums, cnts), a

    (sums, cnts), assign = jax.lax.scan(
        step, (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.int32)), ids
    )
    new_cent = jnp.where(
        (cnts > 0)[:, None], sums / jnp.maximum(cnts, 1)[:, None], cent
    )
    return new_cent, assign.reshape(npad)[:n]


def kmeans(codes, scales, k: int, iters: int = 4, chunk: int = 16384):
    """Deterministic device k-means: evenly-spaced point init, ``iters``
    Lloyd iterations. Returns (centroids f32[K, d], assign i32[N] against
    the FINAL centroids)."""
    n = codes.shape[0]
    chunk = min(chunk, max(n, 1))
    init = np.linspace(0, n - 1, k).round().astype(np.int32)
    cent = dequantize(codes[jnp.asarray(init)], scales[jnp.asarray(init)])
    assign = None
    for _ in range(max(iters, 1)):
        cent, assign = _lloyd_iter(codes, scales, cent, chunk)
    # one more assignment pass so assign matches the final centroids
    _, assign = _lloyd_iter(codes, scales, cent, chunk)
    return cent, assign


def _member_tables(assign_np: np.ndarray, k: int, smax: int):
    """Host-side [K, Smax] member table (pad -1). Overflowing members
    (cluster count > Smax) stay QUERIES in their own batch but are not
    candidates for others; returns (table, n_overflow)."""
    order = np.argsort(assign_np, kind="stable").astype(np.int32)
    sa = assign_np[order]
    starts = np.searchsorted(sa, np.arange(k))
    ends = np.searchsorted(sa, np.arange(k) + 1)
    table = np.full((k, smax), -1, np.int32)
    overflow = 0
    for c in range(k):
        s, e = int(starts[c]), int(ends[c])
        cnt = e - s
        take = min(cnt, smax)
        table[c, :take] = order[s : s + take]
        overflow += cnt - take
    return table, overflow


# ---------------------------------------------------------------------------
# per-cluster-group selection step: pool -> accept chain
#
# Selection and application are two phases ON PURPOSE: cluster pools
# contain not-yet-processed points (that is what makes them better than
# wave pools), so per-batch own-row writes would WIPE reverse edges that
# earlier batches added to a later point's row. Phase A below writes
# every own row (+ its in-degree contribution) in one global pass over
# the full selection; phase B then runs the reverse-edge union-prune +
# orphan repair per batch with own-row writes disabled
# (``_apply_wave_impl(set_own=False)``).


def _cluster_sel_step_impl(
    codes, scales, member, nbrcl, cl_ids, ov_ids, m: int, pool_p: int,
):
    """Heuristic-selected layer-0 neighbors for every member of
    ``cl_ids``' clusters (one dispatch). ``member`` i32[K, Smax]
    (pad -1), ``nbrcl`` i32[K, C] nearest-cluster ids (self first),
    ``cl_ids`` i32[G] this group's clusters (pad -1), ``ov_ids``
    i32[G, Smax] extra overflow queries for these clusters (pad -1; they
    get rows but are nobody's candidate — vanishingly few at the default
    Smax headroom). Returns (qflat i32[G*NQ], sel_d2 [G*NQ, m],
    sel_ids [G*NQ, m])."""
    n = codes.shape[0]
    g, _ = cl_ids.shape[0], None
    smax = member.shape[1]
    c_fan = nbrcl.shape[1]

    cl_safe = jnp.clip(cl_ids, 0, member.shape[0] - 1)
    qids = jnp.where((cl_ids >= 0)[:, None], member[cl_safe], -1)  # [G, S]
    qids = jnp.concatenate([qids, ov_ids], axis=1)  # [G, S + Sov]
    nq = qids.shape[1]
    nb = nbrcl[cl_safe]  # [G, C]
    cand = member[jnp.clip(nb, 0, member.shape[0] - 1)]  # [G, C, Smax]
    cand = jnp.where((nb >= 0)[:, :, None], cand, -1).reshape(g, c_fan * smax)
    cs = c_fan * smax

    qsafe = jnp.clip(qids, 0, n - 1)
    qvec = dequantize(codes[qsafe.reshape(-1)], scales[qsafe.reshape(-1)])
    qvec = qvec.reshape(g, nq, -1)  # [G, NQ, d]
    csafe = jnp.clip(cand, 0, n - 1)
    cvec = dequantize(codes[csafe.reshape(-1)], scales[csafe.reshape(-1)])
    cvec = cvec.reshape(g, cs, -1)  # [G, CS, d]

    # dense pool distances, one batched MXU matmul per group (the direct
    # |q-c|^2 diff-square form would materialize [G, NQ, CS, d])
    qq = jnp.sum(qvec * qvec, axis=2)  # [G, NQ]
    cc = jnp.sum(cvec * cvec, axis=2)  # [G, CS]
    qc = jax.lax.dot_general(
        qvec, cvec, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [G, NQ, CS]
    d2 = jnp.maximum(qq[:, :, None] + cc[:, None, :] - 2.0 * qc, 0.0)

    bad = jnp.logical_or(
        (cand < 0)[:, None, :],  # table pad
        cand[:, None, :] == qids[:, :, None],  # self
    )
    d2 = jnp.where(bad, INF, d2)
    cids = jnp.where(
        jnp.logical_and(jnp.logical_not(bad), (qids >= 0)[:, :, None]),
        jnp.broadcast_to(cand[:, None, :], d2.shape), PAD_ID,
    )
    d2 = jnp.where(cids == PAD_ID, INF, d2)

    # top-P pool per query; re-sorted to the exact (d2, id) lex order the
    # accept chain requires (top_k breaks distance ties by position — only
    # the P-th-boundary tie can differ from a full lex sort, a pool-
    # selection detail the recall gate owns)
    p = min(pool_p, cs)
    nv, pos = jax.lax.top_k(-d2, p)  # [G, NQ, P]
    pool_ids = jnp.take_along_axis(cids, pos, axis=2).reshape(g * nq, p)
    pool_d2 = (-nv).reshape(g * nq, p)
    pool_d2 = jnp.where(pool_ids == PAD_ID, INF, pool_d2)
    pool_d2, pool_ids = sort_dist_id(pool_d2, pool_ids)

    qflat = qids.reshape(g * nq)
    sel_d2, sel_ids = _accept_from_pool(
        codes, scales, qvec.reshape(g * nq, -1), pool_d2, pool_ids, m,
        keep_pruned=True,
    )
    return qflat, sel_d2, sel_ids


_cluster_sel_step = functools.partial(
    jax.jit, static_argnames=("m", "pool_p"),
)(_cluster_sel_step_impl)


@functools.partial(
    jax.jit, static_argnames=("cap",), donate_argnames=("adj", "indeg")
)
def _own_rows_step(adj, indeg, qflat, sel_d2, sel_ids, cap: int):
    """Phase A: write EVERY point's own row + its in-degree contribution
    in one pass over the full selection (see module note above)."""
    n = adj.shape[0]
    t, m = sel_ids.shape
    ok = jnp.logical_and(sel_ids != PAD_ID, (qflat >= 0)[:, None])
    own = jnp.where(ok, sel_ids, -1)
    if m < cap:
        own = jnp.concatenate(
            [own, jnp.full((t, cap - m), -1, jnp.int32)], axis=1
        )
    rows = jnp.where(qflat >= 0, qflat, n)
    adj = adj.at[rows].set(own[:, :cap], mode="drop")
    indeg = indeg.at[jnp.where(ok, sel_ids, n)].add(1, mode="drop")
    return adj, indeg


def _reverse_step_impl(adj, indeg, codes, scales, qflat, sel_d2, sel_ids):
    from .build import _apply_wave_impl  # local: avoid a module cycle

    return _apply_wave_impl(
        adj, indeg, codes, scales, qflat, sel_d2, sel_ids, set_own=False
    )


_reverse_step = functools.partial(
    jax.jit, donate_argnames=("adj", "indeg")
)(_reverse_step_impl)


def build_layer0_clustered(
    graph,
    store,
    params,
    fanout: int = 12,
    pool_p: int = 512,
    points_per_cluster: int = 256,
    kmeans_iters: int = 4,
    smax_headroom: float = 1.75,
    batch_queries: int = 4096,
    bar=None,
) -> None:
    """Build layer 0 of ``graph`` for ALL points in ``store`` with the
    cluster-bulk pipeline (module docstring). Mutates ``graph`` in place;
    layer 0 must be empty (the cluster phase owns every row + the
    in-degree ledger)."""
    n = len(store)
    if n == 0:
        return
    codes, scales = store.codes[:n], store.scales[:n]
    k = max(2, min(n, -(-n // points_per_cluster)))
    cent, assign = kmeans(codes, scales, k, iters=kmeans_iters)

    smax = max(8, int(np.ceil(n / k * smax_headroom / 8)) * 8)
    table, overflow = _member_tables(np.asarray(assign), k, smax)

    # nearest clusters per cluster (self is its own nearest at d2=0)
    c2 = jnp.sum(cent * cent, axis=1)
    cd2 = jnp.maximum(
        c2[:, None] + c2[None, :]
        - 2.0 * jnp.dot(cent, cent.T, preferred_element_type=jnp.float32),
        0.0,
    )
    c_fan = min(fanout, k)
    _, nbrcl = jax.lax.top_k(-cd2, c_fan)  # [K, C] ids, self first
    nbrcl = nbrcl.astype(jnp.int32)

    # overflow queries: members beyond Smax, grouped by cluster on host
    ov_lists = {}
    if overflow:
        counts = np.bincount(np.asarray(assign), minlength=k)
        order = np.argsort(np.asarray(assign), kind="stable").astype(np.int32)
        starts = np.searchsorted(np.asarray(assign)[order], np.arange(k))
        for c in np.flatnonzero(counts > smax):
            s = int(starts[c])
            ov_lists[int(c)] = order[s + smax : s + int(counts[c])]

    member_dev = jnp.asarray(table)
    g = max(1, batch_queries // smax)
    adj = graph.get_layer(0)
    indeg = graph.indeg(0)
    m = params.m
    cap = graph.layer_cap(0)

    # phase SELECT: heuristic neighbors for every point, batch by batch
    sels = []
    for base in range(0, k, g):
        cl = np.full((g,), -1, np.int32)
        take = min(g, k - base)
        cl[:take] = np.arange(base, base + take, dtype=np.int32)
        ov = np.full((g, smax), -1, np.int32)
        for i in range(take):
            extra = ov_lists.get(base + i)
            if extra is not None:
                ov[i, : min(extra.size, smax)] = extra[:smax]
        sels.append(_cluster_sel_step(
            codes, scales, member_dev, nbrcl,
            jnp.asarray(cl), jnp.asarray(ov), m=m, pool_p=pool_p,
        ))
        if bar is not None:
            bar.inc(int(np.sum(table[cl[:take]] >= 0))
                    + sum(min(v.size, smax) for c, v in ov_lists.items()
                          if base <= c < base + take))

    # phase A: all own rows + their in-degree in one global pass
    qflat = jnp.concatenate([s[0] for s in sels])
    sel_d2 = jnp.concatenate([s[1] for s in sels])
    sel_ids = jnp.concatenate([s[2] for s in sels])
    adj, indeg = _own_rows_step(adj, indeg, qflat, sel_d2, sel_ids, cap=cap)

    # phase B: reverse-edge union-prune + orphan repair, batch by batch
    for q_b, d_b, i_b in sels:
        adj, indeg = _reverse_step(adj, indeg, codes, scales, q_b, d_b, i_b)
    graph.set_layer(0, adj, indeg)
