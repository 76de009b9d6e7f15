"""Device-mesh parallelism (SURVEY.md §2.3, §5.8).

``mesh`` holds the shard_map/collective building blocks; ``context`` the
active-mesh contextvar the API layer uses to data-shard batch uploads.
"""

from .context import active_mesh, mesh_size, pad_to_mesh, shard_batch, use_mesh
from .distributed import (
    common_local_rows,
    global_mesh,
    host_local_batch_to_global,
    host_shard,
    init_distributed,
    is_distributed,
)
from .mesh import (
    make_mesh,
    shard_reads,
    sharded_adaptor_scores,
    sharded_pipeline_step,
)

__all__ = [
    "active_mesh",
    "mesh_size",
    "pad_to_mesh",
    "shard_batch",
    "use_mesh",
    "make_mesh",
    "shard_reads",
    "sharded_adaptor_scores",
    "sharded_pipeline_step",
    "init_distributed",
    "is_distributed",
    "host_shard",
    "global_mesh",
    "host_local_batch_to_global",
    "common_local_rows",
]
