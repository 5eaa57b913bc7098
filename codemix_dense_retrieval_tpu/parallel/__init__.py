from codemix_dense_retrieval_tpu.parallel.mesh import make_mesh, shard_axis_size
from codemix_dense_retrieval_tpu.parallel.sharded_search import (
    shard_rows,
    sharded_topk_ip,
)

__all__ = ["make_mesh", "shard_axis_size", "shard_rows", "sharded_topk_ip"]
