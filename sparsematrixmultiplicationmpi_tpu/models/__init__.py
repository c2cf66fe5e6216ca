from .gcn import (
    GCNParams, gcn_forward, gcn_loss, init_gcn, make_train_step,
    normalize_adjacency, synthetic_node_classification,
)
from .eigen import lanczos, topk_eigsh
from .gat import GATParams, gat_layer, init_gat, segment_softmax
from .pagerank import normalize_columns, pagerank, power_iteration
from .solvers import SolveResult, cgls, conjugate_gradient, jacobi

__all__ = [
    "GCNParams", "gcn_forward", "gcn_loss", "init_gcn", "make_train_step",
    "normalize_adjacency", "synthetic_node_classification",
    "GATParams", "gat_layer", "init_gat", "segment_softmax",
    "lanczos", "topk_eigsh",
    "normalize_columns", "pagerank", "power_iteration",
    "SolveResult", "cgls", "conjugate_gradient", "jacobi",
]
