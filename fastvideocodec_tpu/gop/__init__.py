from fastvideocodec_tpu.gop.engine import GOP_ROLLOUTS, rollout
from fastvideocodec_tpu.gop.graph import (
    TreeSchedule,
    generate_graph,
    graph_from_batch,
    refidx_from_graph,
    tree_schedule,
)

__all__ = [
    "GOP_ROLLOUTS",
    "TreeSchedule",
    "generate_graph",
    "graph_from_batch",
    "refidx_from_graph",
    "rollout",
    "tree_schedule",
]
