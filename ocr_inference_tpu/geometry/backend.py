"""Topology-primitive backend: first-party C++ geometry with a cv2 fallback.

The reference delegates every contour-topology operation to OpenCV
(reference: BDRC/line_detection.py:33-44 findContours, :107-185 minAreaRect
skew, :489-548 convexHull grouping; BDRC/utils.py:1081-1097 union bboxes).
This module is the single dispatch point the rest of the framework calls:
when the first-party native library (``ocr_inference_tpu.native``,
geometry.cpp) is buildable it serves every primitive, so an end-to-end run
touches no cv2 topology call; otherwise cv2 serves them with identical
calling conventions.

Selection: env ``OCR_NATIVE_GEOMETRY`` = ``auto`` (default: native when the
toolchain builds it), ``1`` (require native; raise if unavailable), ``0``
(force cv2).

Native-path parity (pinned by tests/test_reference_diff.py and
tests/test_geometry_backend.py):
- ``find_contours`` is full cv2.findContours(RETR_LIST,
  CHAIN_APPROX_SIMPLE) parity — Suzuki-Abe border following emitting outer
  AND hole borders, byte-identical point sequences;
- ``approx_poly_dp`` mirrors cv2's approxPolyDP algorithm (including its
  start-vertex selection and cleanup pass) byte-for-byte on closed curves;
  open-curve results can differ on degenerate self-intersecting polylines
  (neither the framework nor the reference calls the open form);
- ``convex_hull`` reproduces cv2.convexHull's vertex order (Sklansky
  chains + cv2's index-rotation stabilization); exact on contour-domain
  inputs, with a ~0.2% tail of tiny random point clouds (<= 7 points)
  where cv2's triangle orientation differs;
- ``min_area_rect`` replicates cv2's float32 rotating calipers and the 5.x
  [-90, 0) angle convention; residual differences are <1e-4 (cv2's values
  depend on its internal hull vertex order at float32 precision), plus the
  inherent 90-degree representation ambiguity for exact squares.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import cv2
import numpy as np


_STATE: dict[str, Optional[bool]] = {"native": None}


def _native_module():
    from ocr_inference_tpu import native

    return native


def use_native() -> bool:
    """True when topology primitives are served by the C++ library."""
    if _STATE["native"] is None:
        mode = os.environ.get("OCR_NATIVE_GEOMETRY", "auto").lower()
        if mode in ("0", "false", "off", "cv2"):
            _STATE["native"] = False
        else:
            try:
                available = _native_module().native_available()
            except Exception:
                available = False
            if mode in ("1", "true", "on", "native") and not available:
                raise RuntimeError(
                    "OCR_NATIVE_GEOMETRY=1 but the native geometry library "
                    "is unavailable"
                )
            _STATE["native"] = available
    return bool(_STATE["native"])


def set_backend(native: Optional[bool]) -> None:
    """Force the backend (tests / A-B comparisons); None re-reads the env."""
    _STATE["native"] = native


def _is_point_array(arr: np.ndarray) -> bool:
    """Contours are (N, 1, 2) or (N, 2) integer point lists; 2-D uint8/float
    arrays are images (cv2.boundingRect accepts both)."""
    if arr.ndim == 3:
        return True
    return arr.ndim == 2 and arr.shape[1] == 2 and arr.dtype.kind in "iu" \
        and arr.dtype.itemsize >= 2


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def find_contours(mask: np.ndarray) -> Sequence[np.ndarray]:
    """All (outer) contours of a binary mask, bottom-up order, points as
    (N, 1, 2) int32 — the order/shape cv2.findContours(RETR_LIST,
    CHAIN_APPROX_SIMPLE) produces, which downstream reading-order logic
    relies on (geometry/lines.py sort_bbox_centers reverses rows)."""
    if use_native():
        # native scans top-down; cv2 returns bottom-up — match cv2
        return list(reversed(_native_module().find_contours(mask)))
    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    return contours


def contour_area(contour: np.ndarray) -> float:
    if use_native():
        return _native_module().contour_area(contour)
    return float(cv2.contourArea(contour))


def line_threshold(mask: np.ndarray, slice_width: int = 20) -> Optional[float]:
    """One-call native slice-vote threshold (geometry/lines.py
    get_line_threshold semantics), or None when the native library is
    unavailable — the caller then runs the per-slice Python loop over
    ``find_contours`` (identical result, pinned by
    tests/test_geometry_backend.py)."""
    if use_native():
        return _native_module().line_threshold(mask, slice_width)
    return None


def bounding_rect(points_or_mask: np.ndarray) -> tuple[int, int, int, int]:
    """(x, y, w, h) of a point set, or of the nonzero pixels of an image
    (cv2.boundingRect accepts both; reference call sites use both, e.g.
    line_detection.py:379 on the mask image)."""
    arr = np.asarray(points_or_mask)
    if not _is_point_array(arr):
        if use_native():
            rows = np.flatnonzero(arr.any(axis=1))
            cols = np.flatnonzero(arr.any(axis=0))
            if rows.size == 0:
                return (0, 0, 0, 0)
            return (
                int(cols[0]),
                int(rows[0]),
                int(cols[-1] - cols[0] + 1),
                int(rows[-1] - rows[0] + 1),
            )
        return tuple(int(v) for v in cv2.boundingRect(arr))
    if use_native():
        return _native_module().bounding_rect(arr)
    return tuple(int(v) for v in cv2.boundingRect(arr))


def convex_hull(points: np.ndarray) -> np.ndarray:
    if use_native():
        return _native_module().convex_hull(points)
    return cv2.convexHull(points)


def min_area_rect(points: np.ndarray):
    """((cx, cy), (w, h), angle) in THIS cv2's convention — 5.x reports
    angles in [-90, 0) (see CLAUDE.md); the native library already emits
    that convention (float32 calipers parity, geometry.cpp)."""
    if use_native():
        return _native_module().min_area_rect(points)
    return cv2.minAreaRect(points)


def box_points(rect) -> np.ndarray:
    """Corner points of a ((cx, cy), (w, h), angle) rect — pure math
    (cv2.boxPoints parity)."""
    (cx, cy), (w, h), angle = rect
    if not use_native():
        return cv2.boxPoints(((cx, cy), (w, h), angle))
    a = np.deg2rad(angle)
    ux = np.array([np.cos(a), np.sin(a)])
    uy = np.array([-np.sin(a), np.cos(a)])
    c = np.array([cx, cy])
    half_w, half_h = w / 2.0, h / 2.0
    corners = np.stack([
        c - ux * half_w - uy * half_h,
        c + ux * half_w - uy * half_h,
        c + ux * half_w + uy * half_h,
        c - ux * half_w + uy * half_h,
    ])
    return corners.astype(np.float32)


def arc_length(contour: np.ndarray, closed: bool = True) -> float:
    if use_native():
        return _native_module().arc_length(contour, closed)
    return float(cv2.arcLength(contour, closed))


def approx_poly_dp(
    contour: np.ndarray, epsilon: float, closed: bool = True
) -> np.ndarray:
    if use_native():
        return _native_module().approx_poly_dp(contour, epsilon, closed)
    return cv2.approxPolyDP(contour, epsilon, closed)


def moments_centroid(contour: np.ndarray) -> tuple[int, int]:
    """Polygon centroid via Green's theorem (cv2.moments m10/m00, m01/m00
    parity; reference call site: BDRC/utils.py:695-697)."""
    if not use_native():
        m = cv2.moments(contour)
        return int(m["m10"] / m["m00"]), int(m["m01"] / m["m00"])
    pts = np.asarray(contour).reshape(-1, 2).astype(np.float64)
    x, y = pts[:, 0], pts[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return int(x.mean()), int(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return int(cx), int(cy)
