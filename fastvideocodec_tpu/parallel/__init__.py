from fastvideocodec_tpu.parallel.distributed import global_mesh, initialize
from fastvideocodec_tpu.parallel.mesh import (
    gop_sharding,
    make_mesh,
    replicate,
    shard_gop,
    shard_views,
)

__all__ = [
    "global_mesh",
    "gop_sharding",
    "initialize",
    "make_mesh",
    "replicate",
    "shard_gop",
    "shard_views",
]
