"""Batched neighbor-selection heuristic (HNSW Algorithm 4).

Faithful array reimplementation of ``Searcher::select_heuristic``
(``hnsw/src/template/searcher.rs:109-153``) with ``extend_cands`` and
``keep_pruned`` both true, as the insert path uses it
(``inserter.rs:115-123``):

1. candidates := the beam from ``search_layer`` (the reference's
   ``select_setup``, ``results.rs:105-111``), extended with every
   candidate's current graph neighbors
   (``extend_candidates_with_neighbors``, ``results.rs:122-146``),
   deduplicated, sorted by (dist-to-query, id);
2. walk the pool best-first: accept candidate ``e`` iff
   ``(d(e,q), id_e) < (min_s d(e,s), id_s*)`` over already-selected ``s``
   (``get_nearest_from_selected``, ``results.rs:69-77``) — the first
   candidate is accepted unconditionally (``searcher.rs:125-126``), stop
   at ``m`` accepted;
3. keep_pruned: backfill rejected candidates in (dist, id) order up to
   ``m`` (``searcher.rs:141-146``).

The sequential accept loop is a ``lax.scan`` over pool positions whose
carried state is the selected set's dequantized vectors — each step is one
fused [B, m, d] distance eval, so a whole wave of inserts shares every
step. Candidate vectors are gathered per step (and pool distances are
computed in fixed chunks), so no [B, C, d] pool temp ever materializes —
C = ef*(1+cap) reaches thousands at large ``ef_cons``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.distance import l2sq
from .ops.quant import dequantize
from .ops.topk import INF, PAD_ID, dedup_ids, sort_dist_id
from .search import _gather_vecs, _row_min_dist_id

_D2_CHUNK = 256  # pool-distance tile: bounds gather temps to [B, 256, d]


def _chunked_d2(codes, scales, q, ids):
    """Distances from each query to a wide id set [B, E], computed in
    fixed-size chunks so the [B, E, d] gather temp never materializes
    (E = ef*cap can reach thousands; a single gather blows HBM)."""
    b, e = ids.shape
    pad = (-e) % _D2_CHUNK
    idsp = jnp.pad(ids, ((0, 0), (0, pad)))
    chunks = idsp.reshape(b, -1, _D2_CHUNK)

    def step(_, ch):
        vecs = _gather_vecs(codes, scales, ch)
        return None, l2sq(q[:, None, :], vecs)

    _, out = jax.lax.scan(step, None, jnp.moveaxis(chunks, 1, 0))
    return jnp.moveaxis(out, 0, 1).reshape(b, e + pad)[:, :e]


def build_candidate_pool(
    adj: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    q: jnp.ndarray,
    cand_d2: jnp.ndarray,
    cand_ids: jnp.ndarray,
    extend: bool,
    forbid: jnp.ndarray | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted, deduplicated candidate pool [B, C] for the heuristic.

    C = ef + ef*cap when ``extend`` (neighbors of every candidate join the
    pool with their true distance to ``q``), else ef.
    """
    if extend:
        safe = jnp.clip(jnp.where(cand_ids == PAD_ID, 0, cand_ids), 0, adj.shape[0] - 1)
        nbrs = adj[safe]  # [B, ef, cap]
        nvalid = jnp.logical_and(nbrs >= 0, (cand_ids != PAD_ID)[:, :, None])
        b, ef, cap = nbrs.shape
        nbrs = nbrs.reshape(b, ef * cap)
        nvalid = nvalid.reshape(b, ef * cap)
        nd2 = _chunked_d2(codes, scales, q, jnp.where(nvalid, nbrs, 0))
        nd2 = jnp.where(nvalid, nd2, INF)
        nids = jnp.where(nvalid, nbrs, PAD_ID)
        pool_d2 = jnp.concatenate([cand_d2, nd2], axis=1)
        pool_ids = jnp.concatenate([cand_ids, nids], axis=1)
    else:
        pool_d2, pool_ids = cand_d2, cand_ids
    if forbid is not None:
        bad = pool_ids == forbid[:, None]
        pool_d2 = jnp.where(bad, INF, pool_d2)
        pool_ids = jnp.where(bad, PAD_ID, pool_ids)
    pool_d2, pool_ids = dedup_ids(pool_d2, pool_ids)
    return sort_dist_id(pool_d2, pool_ids)


def select_heuristic(
    adj: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    q: jnp.ndarray,
    cand_d2: jnp.ndarray,
    cand_ids: jnp.ndarray,
    m: int,
    extend_cands: bool = True,
    keep_pruned: bool = True,
    forbid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched Algorithm-4 neighbor selection.

    q: f32[B, d]; cand_d2/cand_ids: [B, ef] beam output. Returns the
    selected neighbors as sorted ``(d2 [B, m], ids [B, m])`` padded with
    (inf, PAD_ID).
    """
    pool_d2, pool_ids = build_candidate_pool(
        adj, codes, scales, q, cand_d2, cand_ids, extend_cands, forbid
    )
    b, c = pool_ids.shape
    d = q.shape[1]
    n = codes.shape[0]

    # scan over pool positions; carry = selected set (vec cache + count);
    # each step gathers its own candidate's codes (no [B, C, d] temp)
    sel_vecs0 = jnp.zeros((b, m, d), jnp.float32)
    sel_ids0 = jnp.full((b, m), PAD_ID, jnp.int32)
    sel_valid0 = jnp.zeros((b, m), bool)
    nacc0 = jnp.zeros((b,), jnp.int32)

    slot_iota = jnp.arange(m, dtype=jnp.int32)[None, :]

    def step(carry, xs):
        sel_vecs, sel_ids, sel_valid, nacc = carry
        e_d2, e_id = xs
        e_vec = _gather_vecs(codes, scales, jnp.where(e_id == PAD_ID, 0, e_id))
        valid = e_id != PAD_ID
        active = jnp.logical_and(valid, nacc < m)

        # (min_s d(e, s), id_s*) over currently-selected points
        d2s = l2sq(e_vec[:, None, :], sel_vecs)  # [B, m]
        d2s = jnp.where(sel_valid, d2s, INF)
        near_d2, near_id = _row_min_dist_id(d2s, sel_ids)

        accept = jnp.logical_and(
            active,
            jnp.logical_or(
                e_d2 < near_d2,
                jnp.logical_and(e_d2 == near_d2, e_id < near_id),
            ),
        )
        # write accepted candidate into slot nacc
        hit = jnp.logical_and(accept[:, None], slot_iota == nacc[:, None])
        sel_vecs = jnp.where(hit[:, :, None], e_vec[:, None, :], sel_vecs)
        sel_ids = jnp.where(hit, e_id[:, None], sel_ids)
        sel_valid = jnp.logical_or(sel_valid, hit)
        nacc = nacc + accept.astype(jnp.int32)
        rejected = jnp.logical_and(active, jnp.logical_not(accept))
        return (sel_vecs, sel_ids, sel_valid, nacc), (accept, rejected)

    xs = (
        jnp.moveaxis(pool_d2, 1, 0),
        jnp.moveaxis(pool_ids, 1, 0),
    )
    (_, _, _, nacc), (acc_t, rej_t) = jax.lax.scan(
        step, (sel_vecs0, sel_ids0, sel_valid0, nacc0), xs
    )
    accepted = jnp.moveaxis(acc_t, 0, 1)  # [B, C]
    rejected = jnp.moveaxis(rej_t, 0, 1)

    # keep_pruned backfill: rejected candidates in pool (= Dist) order fill
    # the remaining slots. Early stop (nacc == m) implies no backfill, so
    # the "unprocessed" tail is correctly excluded.
    if keep_pruned:
        rej_rank = jnp.cumsum(rejected.astype(jnp.int32), axis=1) - 1
        fill = jnp.maximum(m - nacc, 0)[:, None]
        in_final = jnp.logical_or(
            accepted, jnp.logical_and(rejected, rej_rank < fill)
        )
    else:
        in_final = accepted
    out_d2 = jnp.where(in_final, pool_d2, INF)
    out_ids = jnp.where(in_final, pool_ids, PAD_ID)
    out_d2, out_ids = sort_dist_id(out_d2, out_ids)
    return out_d2[:, :m], out_ids[:, :m]
