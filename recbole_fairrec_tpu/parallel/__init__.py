from .mesh import batch_sharding, make_mesh, param_sharding, replicate, shard_params
from .embedding import (
    bucket_allgather_lookup,
    pad_table_rows,
    shard_table,
    sharded_gather,
)
from .eval import distributed_topk_scores
from .spmm import pad_rows_to_shards, shard_propagation_matrix, sharded_propagate

__all__ = [
    "pad_rows_to_shards",
    "shard_propagation_matrix",
    "sharded_propagate",
    "batch_sharding",
    "make_mesh",
    "param_sharding",
    "replicate",
    "shard_params",
    "shard_table",
    "sharded_gather",
    "bucket_allgather_lookup",
    "pad_table_rows",
    "distributed_topk_scores",
]
