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

The accept loop is evaluated in static chunks with batched [B, G, m]
distance tests (see the inline note in :func:`select_heuristic` — monotone
rejection makes chunked re-testing exact), so the sequential step count is
~C/G + m instead of C; pool distances are computed in fixed-size tiles so
no [B, C, d] temp ever materializes (C = ef*(1+cap) reaches thousands at
large ``ef_cons``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.distance import l2sq
from .ops.topk import INF, PAD_ID, dedup_ids, sort_dist_id
from .search import _gather_vecs

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

    # Chunked accept loop. The loop is sequential in principle (candidate
    # p's accept test depends on every acceptance at positions < p), but
    # rejection is MONOTONE: the selected set only grows, and more selected
    # points can only shrink min_s d(e, s) — so a candidate that failed
    # once fails forever, and re-testing is free of semantic risk. That
    # lets us process the pool in static chunks of G: per chunk, repeatedly
    # (a) test all candidates against the *current* selected set in one
    # batched [B, G, m] distance eval, (b) accept only the FIRST passer
    # (pool order = Dist order), until no passer remains. Candidates before
    # the first passer saw the correct selected set; candidates after it
    # are re-tested next round. Total iterations ~ C/G + #acceptances
    # instead of C — the difference between ~2100 and ~50 sequential steps
    # per wave at large ef_cons.
    g = min(128, c)
    nchunks = -(-c // g)
    cp = nchunks * g
    pool_d2p = jnp.pad(pool_d2, ((0, 0), (0, cp - c)), constant_values=INF)
    pool_idsp = jnp.pad(pool_ids, ((0, 0), (0, cp - c)), constant_values=PAD_ID)

    sel_vecs0 = jnp.zeros((b, m, d), jnp.float32)
    sel_ids0 = jnp.full((b, m), PAD_ID, jnp.int32)
    sel_valid0 = jnp.zeros((b, m), bool)
    nacc0 = jnp.zeros((b,), jnp.int32)
    stop0 = jnp.full((b,), cp, jnp.int32)  # position of the m-th acceptance

    slot_iota = jnp.arange(m, dtype=jnp.int32)[None, :]
    g_iota = jnp.arange(g, dtype=jnp.int32)[None, :]

    def chunk_step(carry, xs):
        sel_vecs, sel_ids, sel_valid, nacc, stop = carry
        cd2, cids, cbase = xs  # [B, G], [B, G], scalar chunk base
        cvecs = _gather_vecs(
            codes, scales, jnp.where(cids == PAD_ID, 0, cids)
        )  # [B, G, d]
        cvalid = cids != PAD_ID
        cnormsq = jnp.sum(cvecs * cvecs, axis=-1)  # [B, G]

        # near = (min_s d(e, s), tie-min id) per chunk candidate, carried
        # through the accept loop and updated *incrementally*: one fused
        # [B, G, d] eval against the single newly-accepted vector per
        # iteration, instead of re-evaluating against all m selected.
        # Chunk entry computes it against the selected-so-far set once, on
        # the MXU (|e|^2 + |s|^2 - 2 e.s — the broadcast form would
        # materialize a [B, G, m, d] temp, gigabytes per eval).
        es = jax.lax.dot_general(
            cvecs, sel_vecs, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, G, m]
        snormsq = jnp.sum(sel_vecs * sel_vecs, axis=-1)  # [B, m]
        d2s = jnp.maximum(
            cnormsq[:, :, None] + snormsq[:, None, :] - 2.0 * es, 0.0
        )
        d2s = jnp.where(sel_valid[:, None, :], d2s, INF)
        near_d2 = jnp.min(d2s, axis=-1)  # [B, G]
        near_id = jnp.min(
            jnp.where(d2s == near_d2[..., None], sel_ids[:, None, :], PAD_ID),
            axis=-1,
        )

        def pass_mask(near_d2, near_id, nacc, taken):
            ok = jnp.logical_or(
                cd2 < near_d2,
                jnp.logical_and(cd2 == near_d2, cids < near_id),
            )
            return cvalid & ~taken & ok & (nacc < m)[:, None]

        def cond(s):
            return jnp.any(s[7])

        def body(s):
            sel_vecs, sel_ids, sel_valid, nacc, taken, near_d2, near_id, pm, stop = s
            has = jnp.any(pm, axis=1)
            f = jnp.argmax(pm, axis=1)  # first passer (pool order)
            e_vec = jnp.take_along_axis(cvecs, f[:, None, None], axis=1)[:, 0]
            e_id = jnp.take_along_axis(cids, f[:, None], axis=1)[:, 0]
            hit = jnp.logical_and(has[:, None], slot_iota == nacc[:, None])
            sel_vecs = jnp.where(hit[:, :, None], e_vec[:, None, :], sel_vecs)
            sel_ids = jnp.where(hit, e_id[:, None], sel_ids)
            sel_valid = jnp.logical_or(sel_valid, hit)
            nacc = nacc + has.astype(jnp.int32)
            taken = jnp.logical_or(
                taken, jnp.logical_and(has[:, None], g_iota == f[:, None])
            )
            stop = jnp.where(jnp.logical_and(has, nacc == m), cbase + f, stop)
            # incremental near update vs the one new selected vector —
            # batched matvec on the MXU so no [B, G, d] temp materializes
            ev = jax.lax.dot_general(
                cvecs, e_vec, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [B, G]
            enorm = jnp.sum(e_vec * e_vec, axis=-1)  # [B]
            dnew = jnp.maximum(cnormsq + enorm[:, None] - 2.0 * ev, 0.0)
            dnew = jnp.where(has[:, None], dnew, INF)
            closer = dnew < near_d2
            tie = dnew == near_d2
            near_id = jnp.where(
                closer, e_id[:, None],
                jnp.where(tie, jnp.minimum(near_id, e_id[:, None]), near_id),
            )
            near_d2 = jnp.where(closer, dnew, near_d2)
            pm = pass_mask(near_d2, near_id, nacc, taken)
            return (sel_vecs, sel_ids, sel_valid, nacc, taken,
                    near_d2, near_id, pm, stop)

        taken0 = jnp.zeros((b, g), bool)
        pm0 = pass_mask(near_d2, near_id, nacc, taken0)
        (sel_vecs, sel_ids, sel_valid, nacc, taken, _, _, _, stop) = (
            jax.lax.while_loop(
                cond, body,
                (sel_vecs, sel_ids, sel_valid, nacc, taken0,
                 near_d2, near_id, pm0, stop),
            )
        )
        return (sel_vecs, sel_ids, sel_valid, nacc, stop), taken

    bases = jnp.arange(nchunks, dtype=jnp.int32) * g
    xs = (
        pool_d2p.reshape(b, nchunks, g).swapaxes(0, 1),
        pool_idsp.reshape(b, nchunks, g).swapaxes(0, 1),
        bases,
    )
    (_, _, _, nacc, stop), taken_t = jax.lax.scan(
        chunk_step, (sel_vecs0, sel_ids0, sel_valid0, nacc0, stop0), xs
    )
    accepted = jnp.moveaxis(taken_t, 0, 1).reshape(b, cp)[:, :c]

    # keep_pruned backfill: processed-and-rejected candidates (positions
    # before the m-th acceptance, not accepted) in pool order fill the
    # remaining slots. Early stop (nacc == m) implies no backfill, so the
    # unprocessed tail is correctly excluded.
    if keep_pruned:
        pos = jnp.arange(c, dtype=jnp.int32)[None, :]
        rejected = (
            (pool_ids != PAD_ID) & ~accepted & (pos < stop[:, None])
        )
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
