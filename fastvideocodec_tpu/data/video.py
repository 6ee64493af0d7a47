"""Evaluation video input (UVG / MCL-JCV): host-side frame reader.

Equivalent of the reference VideoDataset (dataset.py:25-127): iterates
.mp4/.yuv files frame by frame via OpenCV, optional resize, skips all-black
frames, yields (frame [H, W, 3] float32 in [0,1], end_of_file flag).
Frames come out NHWC-ready (the reference is NCHW torch)."""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class VideoCaptureYUV:
    """Raw YUV420 reader with a cv2.VideoCapture-ish interface."""

    def __init__(self, filename: str, size=None):
        # UVG raw files are 1080p YUV420 by convention unless stated
        self.height, self.width = size if size is not None else (1080, 1920)
        self.frame_len = self.width * self.height * 3 // 2
        self.f = open(filename, "rb")
        self.shape = (int(self.height * 1.5), self.width)

    def isOpened(self):
        return not self.f.closed

    def read(self):
        raw = self.f.read(self.frame_len)
        if len(raw) < self.frame_len:
            self.f.close()
            return False, None
        yuv = np.frombuffer(raw, dtype=np.uint8).reshape(self.shape)
        bgr = cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR_I420)
        return True, bgr

    def release(self):
        if not self.f.closed:
            self.f.close()


class VideoDataset:
    """Iterates all frames of all video files in a directory.

    __getitem__(i) -> (frame, eof) with stateful per-file counters, matching
    the reference's iteration contract so eval drivers port 1:1.
    """

    def __init__(self, root_dir: str, resolution=None, max_files: int = 0):
        if cv2 is None:
            raise RuntimeError("OpenCV required for VideoDataset")
        self._dir = root_dir
        self._frame_size = resolution  # (width, height) or None
        self._total_frames = 0
        self._file_names = []
        for fn in sorted(os.listdir(root_dir)):
            fn = fn.strip("'")
            if fn.split(".")[-1] in ("mp4", "yuv"):
                self._file_names.append(os.path.join(root_dir, fn))
                if max_files > 0 and len(self._file_names) == max_files:
                    break
        self.reset()

    def reset(self):
        self._frame_counter = -1
        self._file_counter = -1
        self._dataset_nums = []
        self._clip = []
        self._cur_file_names = list(self._file_names)

    def _load_next_file(self):
        path = self._cur_file_names.pop()
        cap = VideoCaptureYUV(path) if path.endswith(".yuv") else cv2.VideoCapture(path)
        self._clip = []
        while True:
            ret, img = cap.read()
            if not ret:
                break
            if np.sum(img) == 0:  # skip black frames (dataset.py:74)
                continue
            if self._frame_size is not None:
                img = cv2.resize(img, self._frame_size, interpolation=cv2.INTER_LINEAR)
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            self._clip.append(rgb.astype(np.float32) / 255.0)
        cap.release()
        self._file_counter += 1
        self._dataset_nums.append(len(self._clip))
        self._frame_counter = 0

    def __getitem__(self, idx):
        # same stateful contract as the reference (dataset.py:57-85)
        if (
            not self._dataset_nums
            or self._frame_counter >= self._dataset_nums[self._file_counter] - 1
        ):
            self._load_next_file()
        else:
            self._frame_counter += 1
        eof = self._frame_counter == self._dataset_nums[self._file_counter] - 1
        return self._clip[self._frame_counter], eof

    def __len__(self):
        if not self._total_frames:
            self._count_frames()
        return self._total_frames

    def _count_frames(self):
        self._total_frames = 0
        for path in self._file_names:
            cap = VideoCaptureYUV(path) if path.endswith(".yuv") else cv2.VideoCapture(path)
            while True:
                ret, img = cap.read()
                if not ret:
                    break
                if np.sum(img) == 0:
                    continue
                self._total_frames += 1
            cap.release()
