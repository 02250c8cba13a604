"""Index model families: exact flat search and the HNSW graph index."""

from .flat import FlatIndex

__all__ = ["FlatIndex", "HNSW"]


def __getattr__(name):
    if name == "HNSW":
        from .hnsw import HNSW

        return HNSW
    raise AttributeError(name)
