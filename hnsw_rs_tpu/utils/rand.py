"""Random test-vector generation (``gen_rand_vecs``,
``vectors/src/lib.rs:29-37`` / ``make_rand_vectors``,
``hnsw/src/template.rs:630-638``)."""

from __future__ import annotations

import numpy as np


def gen_rand_vecs(n: int, dim: int, seed: int | None = None) -> np.ndarray:
    """Uniform random float32 vectors in [0, 1), shape [n, dim]."""
    rng = np.random.default_rng(seed)
    return rng.random((n, dim), dtype=np.float32)
