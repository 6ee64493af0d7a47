from fastvideocodec_tpu.ops.pallas.warp_kernel import pallas_flow_warp

__all__ = ["pallas_flow_warp"]
