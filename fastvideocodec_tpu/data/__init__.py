from fastvideocodec_tpu.data.video import VideoDataset, VideoCaptureYUV
from fastvideocodec_tpu.data.vimeo import FrameDataset
from fastvideocodec_tpu.data.multiview import MultiViewVideoDataset
from fastvideocodec_tpu.data.loader import prefetch_batches

__all__ = [
    "FrameDataset",
    "MultiViewVideoDataset",
    "VideoCaptureYUV",
    "VideoDataset",
    "prefetch_batches",
]
