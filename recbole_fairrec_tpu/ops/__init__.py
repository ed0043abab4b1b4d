from .spmm import build_bipartite_norm_coo, build_gcn_norm_coo, spmm_coo

__all__ = ["spmm_coo", "build_bipartite_norm_coo", "build_gcn_norm_coo"]
