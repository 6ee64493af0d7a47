from fastvideocodec_tpu.parallel.mesh import (
    gop_sharding,
    make_mesh,
    replicate,
    shard_gop,
    shard_views,
)

__all__ = ["gop_sharding", "make_mesh", "replicate", "shard_gop", "shard_views"]
