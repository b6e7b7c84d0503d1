from .mesh import make_mesh, device_mesh_info
from .ops import (
    ShardedCSR,
    shard_csr_rows,
    shard_csr_cols,
    shard_csr_grid,
    shard_csr_krows,
    sharded_spmm,
    sharded_spmv,
    sharded_gram,
    sharded_cg,
    sharded_spmm_2d,
    sharded_spmm_ring,
    sharded_spgemm,
    sharded_cgls,
)

__all__ = [
    "make_mesh",
    "device_mesh_info",
    "ShardedCSR",
    "shard_csr_rows",
    "shard_csr_cols",
    "shard_csr_grid",
    "shard_csr_krows",
    "sharded_spmm",
    "sharded_spmv",
    "sharded_gram",
    "sharded_cg",
    "sharded_spmm_2d",
    "sharded_spmm_ring",
    "sharded_spgemm",
    "sharded_cgls",
]
