"""Dataset partitioning and ground-truth fixtures — equivalents of
``hnsw/src/helpers/data.rs``: ``split`` (contiguous id partitions,
``data.rs:6-32``) and brute-force ground-truth JSON fixtures
(``load_bf_data``, ``data.rs:34-62`` — the reference hardcodes the
author's home dir; here paths are explicit)."""

from __future__ import annotations

import json
import os

import numpy as np


def split(n: int, k: int) -> list[np.ndarray]:
    """Split ids 0..n into k contiguous chunks (sizes differ by <= 1)."""
    bounds = np.linspace(0, n, k + 1).astype(int)
    return [np.arange(bounds[i], bounds[i + 1], dtype=np.int32) for i in range(k)]


def save_bf_data(path: str, neighbors: np.ndarray) -> None:
    """Persist precomputed brute-force neighbors as a JSON fixture:
    {query_idx: [neighbor ids...]}."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({str(i): row.tolist() for i, row in enumerate(neighbors)}, f)


def load_bf_data(path: str) -> np.ndarray:
    """Load a brute-force ground-truth fixture written by
    :func:`save_bf_data`."""
    with open(path) as f:
        d = json.load(f)
    n = len(d)
    return np.asarray([d[str(i)] for i in range(n)], dtype=np.int32)
