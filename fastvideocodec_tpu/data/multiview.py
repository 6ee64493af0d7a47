"""MMPTracking multi-camera data (reference MultiViewVideoDataset,
dataset.py:175-266): 5 categories with 4/6/5/4/4 camera views; returns
[GOP, V, 256, 256, 3] float32, with an 80/20 train/test split by frame file
and a streaming-rate simulator (`sample`) that grows the train pool as the
camera-to-server ratio dictates."""

from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image

CATEGORY_VIEWS = {
    "retail_0": 6, "lobby_0": 4, "industry_safety_0": 4,
    "cafe_shop_0": 4, "office_0": 5,
}
CATEGORIES = list(CATEGORY_VIEWS)


class MultiViewVideoDataset:
    def __init__(
        self,
        root_dir: str,
        category_id: int = 0,
        gop_size: int = 16,
        frame_size: int = 256,
        split: str = "train",
        c2s_ratio: float = 1.0,
        sample_interval: int = 0,
        max_pool_size: int = 0,
    ):
        self.category = CATEGORIES[category_id]
        self.num_views = CATEGORY_VIEWS[self.category]
        self.gop_size = gop_size
        self.frame_size = frame_size
        self.c2s_ratio = c2s_ratio
        self.sample_interval = sample_interval
        self.max_pool_size = max_pool_size
        self._dir = os.path.join(root_dir, self.category)

        # frame files are {dir}/rgb_{frame:05d}_{view}.jpg style trees; we
        # index by frame id and load every view per id.
        frame_ids = sorted(
            {f.split("_")[1] for f in os.listdir(self._dir) if f.endswith(".jpg")}
        )
        n = len(frame_ids)
        cut = int(n * 0.8)
        self._frame_ids = frame_ids[:cut] if split == "train" else frame_ids[cut:]
        self._pool_size = len(self._frame_ids)

    def __len__(self):
        return max(0, self._pool_size - self.gop_size)

    def sample(self, step: int) -> int:
        """Streaming-rate pool growth (dataset.py:231-236): every
        sample_interval steps the pool grows by gop*c2s_ratio frames."""
        if self.sample_interval > 0:
            grown = int(
                self.gop_size + step // self.sample_interval * self.gop_size * self.c2s_ratio
            )
            self._pool_size = min(len(self._frame_ids), grown)
            if self.max_pool_size > 0:
                self._pool_size = min(self._pool_size, self.max_pool_size)
        return self._pool_size

    def _load(self, frame_id: str, view: int) -> np.ndarray:
        path = os.path.join(self._dir, f"rgb_{frame_id}_{view + 1}.jpg")
        img = Image.open(path).convert("RGB").resize(
            (self.frame_size, self.frame_size), Image.BILINEAR
        )
        return np.asarray(img, dtype=np.float32) / 255.0

    def __getitem__(self, idx):
        start = idx % max(1, self._pool_size - self.gop_size)
        gop = []
        for t in range(self.gop_size):
            fid = self._frame_ids[start + t]
            gop.append(np.stack([self._load(fid, v) for v in range(self.num_views)]))
        return np.stack(gop)  # [GOP, V, S, S, 3]
