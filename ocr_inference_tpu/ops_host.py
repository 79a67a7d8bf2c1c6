"""Host (cv2/numpy) twins of selected device ops.

Used where tiny inputs or API parity make a host computation the right
call (e.g. the evaluator's pre-binarize, reference: BDRC/inference.py:1026).
Device ops in ``ocr_inference_tpu.ops`` are the source of truth; these match
their semantics exactly (same cv2 calls the reference makes).
"""

from __future__ import annotations

import cv2
import numpy as np


def binarize_host(
    img: np.ndarray, adaptive: bool = True, block_size: int = 51, c: int = 13
) -> np.ndarray:
    """cv2 adaptive Gaussian binarization, 3-channel output
    (reference: BDRC/utils.py:796-815)."""
    line_img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    if adaptive:
        bw = cv2.adaptiveThreshold(
            line_img,
            255,
            cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
            cv2.THRESH_BINARY,
            block_size,
            c,
        )
    else:
        _, bw = cv2.threshold(line_img, 120, 255, cv2.THRESH_BINARY)
    return cv2.cvtColor(bw, cv2.COLOR_GRAY2RGB)


def normalize_host(image: np.ndarray) -> np.ndarray:
    """[0,255] -> [0,1] float32 (reference: BDRC/utils.py:781-793)."""
    return image.astype(np.float32) / 255.0


def sigmoid_host(x):
    """(reference: BDRC/utils.py:563-573)."""
    return 1.0 / (1.0 + np.exp(-x))
