"""Index hyperparameters.

Mirrors the reference's ``Params`` (``hnsw/src/params.rs:5-61``) with the
same derived defaults: ``mmax = m``, ``mmax0 = 2m``, ``ml = 1/ln(m)``,
``ef_cons = 2m``. The entry point ``ep`` lives here too, as in the
reference, but is maintained by the index.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class Params:
    m: int
    dim: int
    mmax: int = 0
    mmax0: int = 0
    ml: float = 0.0
    ef_cons: int = 0
    ep: int = 0
    metric: str = "l2"  # "l2" | "cosine" (cosine = L2 over unit vectors)
    # select_heuristic's extendCandidates flag (Algorithm 4). The reference
    # hardcodes True (inserter.rs:115-123); False (hnswlib's default)
    # shrinks the heuristic pool by a factor of cap+1 and speeds up bulk
    # builds substantially at a small graph-quality cost.
    extend_cands: bool = True

    def __post_init__(self) -> None:
        if self.mmax == 0:
            self.mmax = self.m
        if self.mmax0 == 0:
            self.mmax0 = self.m * 2
        if self.ml == 0.0:
            self.ml = get_default_ml(self.m)
        if self.ef_cons == 0:
            self.ef_cons = self.m * 2

    @classmethod
    def from_m(cls, m: int, dim: int) -> "Params":
        """``Params::from_m`` (``hnsw/src/params.rs:20-30``)."""
        return cls(m=m, dim=dim)

    @classmethod
    def from_m_efcons(cls, m: int, ef_cons: int, dim: int) -> "Params":
        """``Params::from_m_efcons`` (``hnsw/src/params.rs:32-42``)."""
        return cls(m=m, dim=dim, ef_cons=ef_cons)

    def layer_cap(self, layer_nb: int) -> int:
        """Degree cap of a layer: ``mmax0`` at layer 0, ``mmax`` above
        (``graph/src/layers.rs:48-59``)."""
        return self.mmax0 if layer_nb == 0 else self.mmax

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Params":
        return cls(**d)


def get_default_ml(m: int) -> float:
    """``get_default_ml`` (``hnsw/src/params.rs:15-17``)."""
    return 1.0 / math.log(m)
