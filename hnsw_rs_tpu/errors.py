"""Error types, mirroring the reference's ``GraphError``
(``graph/src/errors.rs:3-9``)."""


class GraphError(Exception):
    """Base class for graph topology errors."""


class NodeNotInGraph(GraphError):
    def __init__(self, node: int):
        super().__init__(f"node {node} not in graph")
        self.node = node


class IsolatedNode(GraphError):
    def __init__(self, node: int):
        super().__init__(f"node {node} would become isolated")
        self.node = node


class SelfConnection(GraphError):
    def __init__(self, node: int):
        super().__init__(f"self connection on node {node}")
        self.node = node


class MExceeded(GraphError):
    def __init__(self, node: int, m: int):
        super().__init__(f"node {node} exceeds degree cap {m}")
        self.node = node
        self.m = m


class DimensionMismatch(ValueError):
    """Raised when inserting vectors whose dimension differs from the index
    (the reference panics: ``hnsw/src/template.rs:253-262``)."""
