"""Frame-axis ("sequence") parallelism for the LSVC tree codec.

SURVEY §2.7: the LSVC tree layers are this codebase's sequence-parallel
analog — the reference scatter/gathers a tree layer's frame batch across 2
GPUs with nn.DataParallel decoder wraps (models.py:1194-1203, 1363-1394).
TPU-native version: the whole-GOP step is jitted with the GOP's frame axis
sharded over the mesh 'frame' axis, and the LSVC forward (models/lsvc.py
``frame_axis``) pins the stage-1 flow/mv batch and every tree layer's
frame batch with with_sharding_constraint(P('frame')) — GSPMD keeps each
layer's frames on distinct chips and inserts the parent-recon gathers as
ICI collectives.

Composable with data parallelism: pass a mesh with both axes and shard the
GOP batch dim on 'data' (see tests/test_parallel.py and
__graft_entry__.dryrun_multichip's third half).
"""

from __future__ import annotations

import dataclasses

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastvideocodec_tpu.models.registry import CodecSpec


def frame_sharded_spec(spec: CodecSpec, axis: str = "frame") -> CodecSpec:
    """Derive a CodecSpec whose LSVC module annotates per-layer frame
    batches with the mesh frame axis. Parameters are unchanged (the
    annotation adds no state), so params trained either way interchange."""
    if spec.family != "lsvc":
        raise ValueError(
            f"frame-axis sharding drives the LSVC tree schedule; got "
            f"family '{spec.family}'"
        )
    return dataclasses.replace(spec, module=spec.module.clone(frame_axis=axis))


def gop_frame_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Sharding for the GOP input: the frame (T) axis over 'frame'; with
    ``batched`` the leading batch dim shards over 'data' as well."""
    if batched:
        return NamedSharding(mesh, P("data", "frame"))
    return NamedSharding(mesh, P("frame"))
