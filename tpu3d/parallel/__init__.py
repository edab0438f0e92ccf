"""Multi-chip parallelism: meshes, sharded NN search, batched registration."""

from tpu3d.parallel.batched import register_batch, shard_instances, stack_clouds
from tpu3d.parallel.icp_sharded import icp_refine_sharded
from tpu3d.parallel.mesh import make_mesh, replicated, row_sharded
from tpu3d.parallel.sharded_nn import nearest_neighbor_sharded

__all__ = [
    "icp_refine_sharded",
    "make_mesh",
    "nearest_neighbor_sharded",
    "register_batch",
    "replicated",
    "row_sharded",
    "shard_instances",
    "stack_clouds",
]
