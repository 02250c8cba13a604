"""Ordered (dist, id) selection primitives.

The reference's entire algorithm state lives in ``BTreeSet<Dist>`` priority
queues whose total order is *(dist asc, id asc)* (``graph/src/dist.rs:30-38``
— ties broken by id). On TPU those become fixed-width sorted arrays and the
queue ops become ``lax.sort`` with two lexicographic keys. All helpers here
operate on squared distances (ordering-equivalent).

Conventions:
- padded / invalid slots carry ``dist = +inf`` and ``id = PAD_ID`` so they
  sort last under the lexicographic order;
- adjacency sentinels are ``-1`` (the array analogue of the reference's
  ``NodeID::MAX`` fixed-slot padding, ``graph/src/graph.rs:168-181``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_ID = jnp.iinfo(jnp.int32).max  # sorts last among ids at equal dist
SENTINEL = -1  # empty adjacency slot
INF = jnp.inf


def sort_dist_id(
    dists: jnp.ndarray, ids: jnp.ndarray, *extras: jnp.ndarray
) -> tuple[jnp.ndarray, ...]:
    """Sort along the last axis by (dist asc, id asc), carrying extras."""
    out = jax.lax.sort((dists, ids) + extras, dimension=-1, num_keys=2)
    return out


def topk_dist_id(
    dists: jnp.ndarray, ids: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k smallest by (dist, id) along the last axis.

    Equivalent to ``Results::get_top_selected`` over a full candidate row
    (``hnsw/src/template/results.rs:59-61``).
    """
    sd, si = sort_dist_id(dists, ids)
    return sd[..., :k], si[..., :k]


def mask_invalid(
    dists: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replace invalid lanes with (+inf, PAD_ID) so they sort last."""
    return (
        jnp.where(valid, dists, INF),
        jnp.where(valid, ids, PAD_ID),
    )


def dedup_ids(
    dists: jnp.ndarray, ids: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invalidate duplicate ids along the last axis (keep one occurrence).

    Works by sorting on id, flagging repeats, and pushing them to
    (+inf, PAD_ID). Output order is *not* restored — callers re-sort by
    (dist, id) anyway. Mirrors the set semantics of ``BTreeSet`` /
    ``IntSet`` inserts in the reference.
    """
    si, sd = jax.lax.sort((ids, dists), dimension=-1, num_keys=1)
    first = jnp.concatenate(
        [
            jnp.ones_like(si[..., :1], dtype=bool),
            si[..., 1:] != si[..., :-1],
        ],
        axis=-1,
    )
    return mask_invalid(sd, si, first)
