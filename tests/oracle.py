"""Scalar numpy oracles for the traversal/heuristic semantics.

``beam_search_oracle`` mirrors hnsw_rs_tpu's flagged-beam semantics (one
query at a time, explicit sets) to catch vectorization bugs;
``heuristic_oracle`` mirrors the reference's select_heuristic loop
(``hnsw/src/template/searcher.rs:109-153``) exactly.
"""

import numpy as np

PAD = np.iinfo(np.int32).max


def d2(a, b):
    diff = np.asarray(a, np.float64).astype(np.float32) - np.asarray(b, np.float32)
    return float(np.sum(diff.astype(np.float32) ** 2, dtype=np.float32))


def dist_less(a, b):
    """(d2, id) lexicographic strict less."""
    return a[0] < b[0] or (a[0] == b[0] and a[1] < b[1])


def greedy_oracle(adj, X, q, cur_id, forbid=None):
    cur = (d2(q, X[cur_id]), cur_id)
    while True:
        nbrs = [int(j) for j in adj[cur[1]] if j >= 0 and j != forbid]
        if not nbrs:
            return cur
        cand = sorted(((d2(q, X[j]), j) for j in nbrs))[0]
        if dist_less(cand, cur):
            cur = cand
        else:
            return cur


def beam_search_oracle(adj, X, q, entries, ef, forbid=None):
    """Flagged-beam search, one query. entries: list[(d2, id)]."""
    beam = sorted(set(entries))[:ef]  # (d2, id) tuples
    expanded = set()
    visited = {i for _, i in entries}
    if forbid is not None:
        visited.add(forbid)
    while True:
        unexp = [e for e in beam if e[1] not in expanded]
        if not unexp:
            return beam
        cand = unexp[0]
        expanded.add(cand[1])
        new = []
        for j in adj[cand[1]]:
            j = int(j)
            if j < 0 or j in visited or j == forbid:
                continue
            visited.add(j)
            new.append((d2(q, X[j]), j))
        beam = sorted(beam + new)[:ef]


def heuristic_oracle(adj, X, q, cands, m, extend=True, keep_pruned=True, forbid=None):
    """Reference select_heuristic semantics (searcher.rs:109-153)."""
    pool = dict(cands)  # id -> d2 ... wait, keys are ids
    pool = {i: d for d, i in cands}
    if extend:
        for _, i in cands:
            for j in adj[i]:
                j = int(j)
                if j >= 0 and j not in pool:
                    pool[j] = d2(q, X[j])
    if forbid is not None:
        pool.pop(forbid, None)
    ordered = sorted((d, i) for i, d in pool.items())
    selected = []
    visited_h = []
    if not ordered:
        return []
    # first candidate accepted unconditionally (searcher.rs:125-126)
    selected.append(ordered[0])
    for e in ordered[1:]:
        if len(selected) >= m:
            break
        nearest = sorted((d2(X[e[1]], X[s[1]]), s[1]) for s in selected)[0]
        if dist_less(e, nearest):
            selected.append(e)
        elif keep_pruned:
            visited_h.append(e)
    if keep_pruned:
        for e in visited_h:
            if len(selected) >= m:
                break
            selected.append(e)
    return sorted(selected)
