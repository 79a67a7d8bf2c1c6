"""Preview/visualization helpers (reference: BDRC/utils.py:66-89, 576-711,
902-962 and LayoutDetection.create_preview_image, inference.py:210-261)."""

from __future__ import annotations

from typing import Optional

import cv2

from ocr_inference_tpu.geometry import backend as geo
import numpy as np

from ocr_inference_tpu.core.config import COLOR_DICT
from ocr_inference_tpu.core.data import BBox, RotatedBBox


def draw_bbox(image: np.ndarray, bbox: BBox, color=(0, 255, 0), thickness=2):
    """(reference: BDRC/utils.py:902-904)."""
    cv2.rectangle(
        image, (bbox.x, bbox.y), (bbox.x + bbox.w, bbox.y + bbox.h),
        color, thickness,
    )
    return image


def draw_rotated_bbox(image: np.ndarray, obb: RotatedBBox,
                      color=(0, 0, 255), thickness=2):
    """(reference: BDRC/utils.py:907-915)."""
    cv2.polylines(image, [obb.points], isClosed=True, color=color,
                  thickness=thickness)
    return image


def generate_line_preview(prediction: np.ndarray,
                          filtered_contours: list[np.ndarray]) -> np.ndarray:
    """Filled-contour preview mask (reference: BDRC/utils.py:704-710)."""
    preview = np.zeros(shape=prediction.shape, dtype=np.uint8)
    for cnt in filtered_contours:
        cv2.drawContours(preview, [cnt], -1, color=(255, 0, 0), thickness=-1)
    return preview


def _color(name: str) -> tuple[int, int, int]:
    return tuple(int(x) for x in COLOR_DICT[name].split(","))


def create_preview_image(
    image: np.ndarray,
    image_predictions: Optional[list] = None,
    line_predictions: Optional[list] = None,
    caption_predictions: Optional[list] = None,
    margin_predictions: Optional[list] = None,
    alpha: float = 0.4,
) -> np.ndarray:
    """Blend per-class contour overlays onto the page
    (reference: BDRC/utils.py:918-962)."""
    mask = np.zeros(image.shape, dtype=np.uint8)
    for preds, name in [
        (image_predictions, "image"),
        (line_predictions, "line"),
        (caption_predictions, "caption"),
        (margin_predictions, "margin"),
    ]:
        if preds:
            for idx, _ in enumerate(preds):
                cv2.drawContours(
                    mask, preds, contourIdx=idx, color=_color(name),
                    thickness=-1,
                )
    cv2.addWeighted(mask, alpha, image, 1 - alpha, 0, image)
    return image


def create_layout_preview(image: np.ndarray, layout_mask: np.ndarray,
                          classes: list[str], alpha: float = 0.4) -> np.ndarray:
    """Layout-engine preview from an (H, W, C) class mask
    (reference: LayoutDetection.create_preview_image, inference.py:210-261)."""
    from ocr_inference_tpu.geometry import get_contours, optimize_contour

    def class_contours(channel: np.ndarray, size_thresh: int = 200):
        binary = np.where(channel > 200, 255, 0).astype(np.uint8)
        if binary.sum() == 0:
            return []
        contours = [optimize_contour(c) for c in get_contours(binary)]
        return [c for c in contours if geo.contour_area(c) > size_thresh]

    named = {}
    for idx, name in enumerate(classes):
        if name == "background" or idx >= layout_mask.shape[2]:
            continue
        named[name] = class_contours(layout_mask[:, :, idx])

    return create_preview_image(
        image,
        image_predictions=named.get("image"),
        line_predictions=named.get("line"),
        caption_predictions=named.get("caption"),
        margin_predictions=named.get("margin"),
        alpha=alpha,
    )
