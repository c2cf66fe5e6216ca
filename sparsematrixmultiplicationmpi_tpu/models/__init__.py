from .gcn import (
    GCNParams, gcn_forward, gcn_loss, init_gcn, make_train_step,
    normalize_adjacency, synthetic_node_classification,
)
from .pagerank import pagerank, power_iteration
from .solvers import SolveResult, conjugate_gradient, jacobi

__all__ = [
    "GCNParams", "gcn_forward", "gcn_loss", "init_gcn", "make_train_step",
    "normalize_adjacency", "synthetic_node_classification",
    "pagerank", "power_iteration",
    "SolveResult", "conjugate_gradient", "jacobi",
]
