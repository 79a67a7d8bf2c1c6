"""Directory image dataset (reference: ImageInferenceDataset,
BDRC/inference.py:829-857) — the host-side image source for batch runs,
torch-free: plain iteration plus a thread-pooled prefetch iterator."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from glob import glob
from typing import Iterator, Optional

import cv2
import numpy as np


class ImageInferenceDataset:
    """Sorted directory of images; items are (image_rgb, meta) like the
    reference's (tensor, meta) pairs."""

    EXTENSIONS = (".jpg", ".png", ".jpeg", ".tif", ".tiff")

    def __init__(self, root_dir: str, mode: str = "rgb"):
        self._mode = mode
        self.paths = sorted(
            p
            for p in glob(os.path.join(root_dir, "*"))
            if p.lower().endswith(self.EXTENSIONS)
        )

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int):
        path = self.paths[idx]
        img = cv2.imread(path)
        if img is None:
            raise IOError(f"failed to read {path}")
        if self._mode == "rgb":
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        meta = {
            "image_name": os.path.basename(path),
            "orig_shape": (img.shape[0], img.shape[1]),
        }
        return img, meta

    get_item = __getitem__  # reference API alias (inference.py:841)

    def iter_prefetched(self, num_workers: int = 4) -> Iterator:
        """Threaded prefetch iterator (replaces DataLoader workers)."""
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            yield from pool.map(self.__getitem__, range(len(self)))
