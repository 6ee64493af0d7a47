from fastvideocodec_tpu.parallel.distributed import global_mesh, initialize
from fastvideocodec_tpu.parallel.frame import frame_sharded_spec, gop_frame_sharding
from fastvideocodec_tpu.parallel.mesh import (
    gop_sharding,
    make_mesh,
    replicate,
    shard_gop,
    shard_views,
)

__all__ = [
    "frame_sharded_spec",
    "global_mesh",
    "gop_frame_sharding",
    "gop_sharding",
    "initialize",
    "make_mesh",
    "replicate",
    "shard_gop",
    "shard_views",
]
