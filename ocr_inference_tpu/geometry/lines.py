"""Line geometry: contours, skew, reading order, line-strip extraction.

Host-side counterpart of the device mask pipeline (reference:
BDRC/line_detection.py). Contour topology is inherently dynamic-shaped, so it
runs on host (cv2 topology now, with the framework's C++ geometry library as
the drop-in alternative); everything dense stayed on device upstream.

Key behavioral parity points with the reference:
- skew = mean of minAreaRect angles of large contours, with the near-0 vs
  near-90 population split (line_detection.py:107-185);
- reading order via vertical-slice voting threshold + running-mean row
  grouping, rows reversed at the end (line_detection.py:362-486);
- line extraction with the adaptive-k dilate/retry loop and the k carry-over
  across lines (line_detection.py:291-359) — here computed on a padded ROI
  instead of full-page masks, which is output-equivalent (the dilation
  support of a single contour is local) but O(bbox) instead of O(page).
"""

from __future__ import annotations

from typing import Sequence

import sys

import cv2
import numpy as np

from ocr_inference_tpu.core.data import BBox, Line, generate_guid
from ocr_inference_tpu.geometry import backend as geo


# ---------------------------------------------------------------------------
# Contour topology (host)
# ---------------------------------------------------------------------------

def get_contours(image: np.ndarray) -> Sequence[np.ndarray]:
    """All contours, no hierarchy (reference: line_detection.py:33-44).
    Served by the native C++ topology backend when available
    (geometry/backend.py)."""
    return geo.find_contours(image.astype(np.uint8))


def optimize_contour(cnt: np.ndarray, e: float = 0.001) -> np.ndarray:
    """Polygon simplification, epsilon 0.001*arclen
    (reference: line_detection.py:47-59)."""
    epsilon = e * geo.arc_length(cnt, True)
    return geo.approx_poly_dp(cnt, epsilon, True)


def rotate_from_angle(image: np.ndarray, angle: float) -> np.ndarray:
    """Host rotation identical to the device op
    (reference: line_detection.py:62-76)."""
    rows, cols = image.shape[:2]
    rot_matrix = cv2.getRotationMatrix2D((cols / 2, rows / 2), angle, 1)
    return cv2.warpAffine(image, rot_matrix, (cols, rows), borderValue=(0, 0, 0))


def mask_n_crop(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Apply mask, drop every all-zero row and column
    (reference: line_detection.py:79-104).

    Parity notes (byte-equal with the reference, pinned by
    tests/test_reference_diff.py):
    - np.delete over ``~any`` removes INTERIOR all-zero rows/columns too,
      not just the margins;
    - on 3-channel input ``any(axis=1)`` is per-channel, so a row is
      dropped when ANY single channel is all-zero along it (np.delete
      ignores the duplicate indices np.where emits per channel);
    - the column profile is computed AFTER row deletion."""
    image = image.astype(np.uint8)
    mask = mask.astype(np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    if mask.ndim == 3:
        mask = mask[..., 0]
    masked = image * (mask[..., None] > 0)
    rows_keep = masked.any(axis=1).all(axis=1)
    masked = masked[rows_keep]
    cols_keep = masked.any(axis=0).all(axis=1)
    return masked[:, cols_keep]


# ---------------------------------------------------------------------------
# Page skew
# ---------------------------------------------------------------------------

def calculate_rotation_angle_from_lines(
    line_mask: np.ndarray, max_angle: float = 5.0
) -> float:
    """Page skew from line contour orientations
    (reference: line_detection.py:145-185)."""
    contours = get_contours(line_mask)
    mask_threshold = line_mask.shape[0] * line_mask.shape[1] * 0.001
    contours = [x for x in contours if geo.contour_area(x) > mask_threshold]
    if not contours:
        return 0.0
    angles = [geo.min_area_rect(x)[2] for x in contours]
    # minAreaRect angle conventions differ across cv2 versions: 4.x returns
    # [0, 90), 5.x returns (-90, 0]. The reference's low/high split
    # (line_detection.py:171-183) assumes 4.x; normalize to the actual line
    # tilt in (-45, 45] so the same intent holds under either convention:
    # positive tilt = counter-clockwise page skew that rotate_from_angle
    # undoes with a positive angle.
    tilts = []
    for a in angles:
        if a <= -45.0:
            a += 90.0
        elif a > 45.0:
            a -= 90.0
        tilts.append(a)
    cands = [t for t in tilts if t != 0.0 and abs(t) < max_angle]
    if not cands:
        return 0.0
    return float(np.mean(cands))


# Alias matching the reference's duplicate definition pair
# (line_detection.py:107 vs :145 — the robust variant wins here).
get_rotation_angle_from_lines = calculate_rotation_angle_from_lines


# ---------------------------------------------------------------------------
# Line objects
# ---------------------------------------------------------------------------

def build_line_data(contour: np.ndarray, optimize: bool = True) -> Line:
    """Contour -> Line with bbox + center (reference: line_detection.py:188)."""
    if optimize:
        contour = optimize_contour(contour)
    x, y, w, h = geo.bounding_rect(contour)
    bbox = BBox(x, y, w, h)
    return Line(
        guid=generate_guid(clock_seq=23),
        contour=contour,
        bbox=bbox,
        center=(x + w // 2, y + h // 2),
    )


def build_raw_line_data(
    image: np.ndarray, line_mask: np.ndarray, rot_threshold: float = 0.5,
    rgb_mask: bool = True,
):
    """Deskew + contour extraction (reference: line_detection.py:212-244).

    Returns (rotated_image, rotated_mask, contours, angle). Rotation is
    applied only when the detected skew exceeds rot_threshold degrees.

    ``rgb_mask=True`` replicates the mask to 3 channels like the reference
    (byte-parity contract, tests/test_reference_diff.py). The pipeline
    passes ``rgb_mask=False``: every internal consumer (filter, reading
    order, line_threshold, TPS) handles the 2-D mask directly, and the
    replication is pure host-CPU waste — a 12.7 MB page-size alloc plus a
    GRAY<->RGB conversion pair per page on the profile's hottest call.
    """
    if line_mask.ndim == 3:
        line_mask = cv2.cvtColor(line_mask, cv2.COLOR_BGR2GRAY)

    angle = calculate_rotation_angle_from_lines(line_mask)

    # Documented divergence: the reference gates on `angle > threshold`
    # (line_detection.py:228), which under its own angle conventions never
    # fires for clockwise skews — one whole rotation direction ships
    # uncorrected (round-5 eval measured 5-25% CER on those pages vs ~0%
    # for the counter-clockwise half). The evident intent is |angle|.
    if abs(angle) > rot_threshold:
        out_mask = rotate_from_angle(line_mask, angle)
        out_img = rotate_from_angle(image, angle)
    else:
        out_mask = line_mask
        out_img = image

    line_contours = [
        x for x in get_contours(out_mask) if geo.contour_area(x) > 10
    ]
    if rgb_mask:
        out_mask = cv2.cvtColor(out_mask, cv2.COLOR_GRAY2RGB)
    return out_img, out_mask, line_contours, angle


def filter_line_contours(
    image: np.ndarray, line_contours, threshold: float = 0.01
) -> list:
    """Drop thin/short fragments: keep w > 1% page width and h > 10 px
    (reference: line_detection.py:247-264)."""
    filtered = []
    for cnt in line_contours:
        _, _, w, h = geo.bounding_rect(cnt)
        if w > image.shape[1] * threshold and h > 10:
            filtered.append(cnt)
    return filtered


# ---------------------------------------------------------------------------
# Line-strip extraction (ROI-local, adaptive k)
# ---------------------------------------------------------------------------

class _LineRoi:
    """Retry-invariant ROI state for one line's strip extraction.

    The reference's adaptive-k loop re-runs dilate + mask + crop on
    FULL-PAGE buffers per attempt (reference: line_detection.py:267-320).
    Here everything k-independent — the padded ROI around the contour (the
    dilation support of one contour is local, so results are identical), the
    rasterized contour mask, and the any-channel-nonzero map — is computed
    once; each k attempt costs one small dilate + two SIMD cv2 reduces, and
    only the accepted attempt materializes the masked crop."""

    def __init__(self, image: np.ndarray, contour: np.ndarray, bbox_h: int,
                 k_factor: float):
        k0 = int(bbox_h * k_factor)
        kw0 = max(k0, 1)
        kh0 = max(int(k0 * k_factor), 1)
        x, y, w, h = geo.bounding_rect(contour)
        pad_x = kw0 // 2 + 1
        pad_y = kh0 // 2 + 1
        x0 = max(0, x - pad_x)
        y0 = max(0, y - pad_y)
        x1 = min(image.shape[1], x + w + pad_x)
        y1 = min(image.shape[0], y + h + pad_y)
        roi = image[y0:y1, x0:x1]
        if roi.ndim == 2:
            roi = roi[..., None]
        self.roi = roi
        self.mask = np.zeros(roi.shape[:2], dtype=np.uint8)
        shifted = contour - np.array([[[x0, y0]]], dtype=contour.dtype)
        cv2.drawContours(self.mask, [shifted], -1, 255, -1)
        # Native fast path: packed-bit attempts + fused masked crop
        # (native/geometry.cpp, byte-parity pinned by
        # tests/test_geometry_backend.py). Falls back to the cv2 path on
        # exotic layouts (non-interleaved / non-uint8) or no toolchain.
        self._packed = None
        if geo.use_native():
            try:
                self._packed = geo._native_module().PackedLineRoi(
                    roi, self.mask
                )
            except (ValueError, RuntimeError):
                self._packed = None
        if self._packed is None:
            self.channels = [np.ascontiguousarray(roi[..., c])
                             for c in range(roi.shape[2])]

    def attempt(self, bbox_h: int, k: float):
        """One dilation attempt; returns (strip_height, crop_fn).

        Parity with mask_n_crop's np.delete semantics: the strip height is
        the COUNT of kept rows (a row survives iff every channel has a
        nonzero in it under the dilated mask; interior failing rows are
        deleted, not spanned). Only that count — the accept criterion — is
        computed up front; the column profile (evaluated on the row-filtered
        strip, as the reference's second np.delete is) and the masked crop
        are deferred to crop(), so rejected attempts pay one dilate + C
        bitwise_and/row-reduce pairs and nothing else.

        Divergence from the reference (documented in PARITY.md): a k so
        small that ``int(k_size * k)`` is 0 crashes cv2 in the reference,
        which then serves its blank fallback image; we clamp the kernel to
        1 px and return the real strip."""
        k_size = int(bbox_h * k)
        kw = max(k_size, 1)
        kh = max(int(k_size * k), 1)
        if self._packed is not None:
            packed = self._packed
            height = packed.attempt_height(kw, kh)
            return height, lambda: packed.masked_crop(kw, kh)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (kw, kh))
        dilated = cv2.dilate(self.mask, kernel, iterations=1)
        # dilated is 0/255, so bitwise_and(channel, dilated) == the masked
        # channel; per-channel row profile = row has any nonzero masked px
        nzc = [cv2.bitwise_and(ch, dilated) for ch in self.channels]
        rows_keep = cv2.reduce(nzc[0], 1, cv2.REDUCE_MAX) > 0
        for nz in nzc[1:]:
            rows_keep &= cv2.reduce(nz, 1, cv2.REDUCE_MAX) > 0
        rows_keep = rows_keep.ravel()
        height = int(np.count_nonzero(rows_keep))

        def crop():
            if height == 0:
                sub = [nz[rows_keep] for nz in nzc]
                return np.stack(sub, axis=-1)
            sub = [nz[rows_keep] for nz in nzc]
            cols_keep = sub[0].max(axis=0) > 0
            for s in sub[1:]:
                cols_keep &= s.max(axis=0) > 0
            return np.stack([s[:, cols_keep] for s in sub], axis=-1)

        return height, crop


def _extract_line_roi(
    image: np.ndarray, contour: np.ndarray, bbox_h: int, k_factor: float
) -> np.ndarray:
    """Single-shot ROI-local strip extraction (reference semantics:
    line_detection.py:267-288 extract_line)."""
    _, crop = _LineRoi(image, contour, bbox_h, k_factor).attempt(
        bbox_h, k_factor
    )
    return crop()


def get_line_image_from_mask(
    image: np.ndarray,
    mask: np.ndarray,
    bbox_h: int,
    bbox_tolerance: float = 2.5,
    k_factor: float = 1.2,
) -> tuple[np.ndarray, float]:
    """Adaptive strip extraction from an explicit full-page mask (used by the
    local-TPS path where the mask has been warped; reference:
    line_detection.py:291-327 signature)."""

    def extract(k: float) -> np.ndarray:
        k_size = int(bbox_h * k)
        kernel = cv2.getStructuringElement(
            cv2.MORPH_RECT, (max(k_size, 1), max(int(k_size * k), 1))
        )
        dilated = cv2.dilate(mask.astype(np.uint8), kernel, iterations=1)
        return mask_n_crop(image, dilated)

    try:
        tmp_k = k_factor
        line_img = extract(tmp_k)
        attempts = 0
        while line_img.shape[0] > bbox_h * bbox_tolerance and attempts < 10:
            tmp_k -= 0.1
            if tmp_k <= 0.1:
                break
            line_img = extract(tmp_k)
            attempts += 1
        return line_img, tmp_k
    except Exception as e:
        print(f"Error in get_line_image_from_mask: {e}", file=sys.stderr)
        return np.zeros((bbox_h, bbox_h * 2, 3), dtype=np.uint8), k_factor


def get_line_image(
    image: np.ndarray,
    contour: np.ndarray,
    bbox_h: int,
    bbox_tolerance: float = 2.5,
    k_factor: float = 1.2,
) -> tuple[np.ndarray, float]:
    """Adaptive strip extraction: shrink k by 0.1 (max 10 tries) until the
    strip height fits bbox_h * tolerance (reference:
    line_detection.py:291-327, incl. the blank-image fallback). Retries only
    recompute the dilation extent; the crop materializes once."""
    try:
        roi = _LineRoi(image, contour, bbox_h, k_factor)
        tol = bbox_h * bbox_tolerance
        # the reference's attempted-k grid, replicating its float
        # accumulation (tmp_k -= 0.1 ten times, stop at <= 0.1)
        cands = [k_factor]
        t = k_factor
        truncated_k = None
        for _ in range(10):
            t -= 0.1
            if t <= 0.1:
                truncated_k = t
                break
            cands.append(t)

        height, crop = roi.attempt(bbox_h, cands[0])
        if height <= tol:
            return crop(), cands[0]
        # Strip too tall at the starting k. The reference walks the grid
        # down 0.1 at a time; strip height is MONOTONE in k (rect dilation
        # supports nest as the kernel grows), so the first passing k of the
        # descending scan is the smallest-index passing candidate — found
        # here by binary search in ~log attempts with the identical result.
        lo, hi = 1, len(cands) - 1
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            h_m, crop_m = roi.attempt(bbox_h, cands[mid])
            if h_m <= tol:
                best = (mid, crop_m)
                hi = mid - 1
            else:
                lo = mid + 1
        if best is not None:
            return best[1](), cands[best[0]]
        # nothing passes within the retry window: the reference returns the
        # LAST attempted crop, with the decremented k when it fell below 0.1
        if len(cands) > 1:
            _, crop = roi.attempt(bbox_h, cands[-1])
        final_k = truncated_k if truncated_k is not None else cands[-1]
        return crop(), final_k
    except Exception as e:  # parity: never let one line kill a page
        print(f"Error in get_line_image: {e}", file=sys.stderr)
        return np.zeros((bbox_h, bbox_h * 2, 3), dtype=np.uint8), k_factor


def extract_line_images(
    image: np.ndarray,
    line_data: list[Line],
    default_k: float = 1.7,
    bbox_tolerance: float = 3,
) -> list[np.ndarray]:
    """Extract strips for sorted lines, carrying the adapted k forward
    (reference: line_detection.py:330-359)."""
    current_k = default_k
    line_images = []
    for line in line_data:
        _, _, _, h = geo.bounding_rect(line.contour)
        line_img, adapted_k = get_line_image(
            image, line.contour, h, bbox_tolerance=bbox_tolerance,
            k_factor=current_k,
        )
        line_images.append(line_img)
        if current_k != adapted_k:
            current_k = adapted_k
    return line_images


# ---------------------------------------------------------------------------
# Reading order
# ---------------------------------------------------------------------------

def get_line_threshold(line_prediction: np.ndarray, slice_width: int = 20) -> float:
    """Row-grouping threshold via vertical slice voting
    (reference: line_detection.py:362-421)."""
    if line_prediction.ndim == 3:
        line_prediction = cv2.cvtColor(line_prediction, cv2.COLOR_BGR2GRAY)

    native = geo.line_threshold(line_prediction, slice_width)
    if native is not None:
        return native

    x, y, w, h = geo.bounding_rect(line_prediction)
    x_steps = (w // slice_width) // 2

    bbox_numbers = []
    for step in range(1, x_steps + 1):
        x_start = x + x_steps * step
        x_end = x_start + slice_width
        _slice = line_prediction[y : y + h, x_start:x_end]
        contours = geo.find_contours(_slice)
        bbox_numbers.append((len(contours), contours))

    if not bbox_numbers:
        return 0.0
    n_contours, contours = max(bbox_numbers, key=lambda t: t[0])
    if n_contours == 0:
        return 0.0
    y_centers = []
    for cnt in contours:
        _, cy, _, ch = geo.bounding_rect(cnt)
        y_centers.append(cy + ch // 2)
    if not y_centers:
        return 0.0
    return float(np.median(y_centers) // n_contours)


def sort_bbox_centers(
    bbox_centers: list[tuple[int, int]], line_threshold: float = 20
) -> list[list[tuple[int, int]]]:
    """Group centers into rows by running-mean y distance; rows sorted by x
    and the row list reversed (reference: line_detection.py:424-486 — the
    reversal turns cv2's bottom-up contour order into reading order)."""
    if not bbox_centers:
        return []
    rows: list[list[tuple[int, int]]] = []
    current: list[tuple[int, int]] = []
    for center in bbox_centers:
        if current:
            mean_y = np.mean([c[1] for c in current])
            if abs(mean_y - center[1]) > line_threshold:
                current.sort(key=lambda c: c[0])
                rows.append(current.copy())
                current.clear()
        current.append(center)
    if current:
        rows.append(current)
    for row in rows:
        row.sort(key=lambda c: c[0])
    return list(reversed(rows))


def group_line_chunks(
    sorted_bbox_centers, lines: list[Line]
) -> list[Line]:
    """Merge same-row chunks via convex hull over their stacked contours
    (reference: line_detection.py:489-548). On duplicate centers the FIRST
    matching line wins, as in the reference's linear scan with break."""
    by_center: dict = {}
    for line in lines:
        by_center.setdefault(line.center, line)
    new_lines: list[Line] = []
    for row in sorted_bbox_centers:
        if len(row) > 1:
            contour_stack = [
                by_center[c].contour for c in row if c in by_center
            ]
            if not contour_stack:
                continue
            stacked = geo.convex_hull(np.vstack(contour_stack))
            x, y, w, h = geo.bounding_rect(stacked)
            bbox = BBox(x, y, w, h)
            new_lines.append(
                Line(
                    guid=generate_guid(clock_seq=23),
                    contour=stacked,
                    bbox=bbox,
                    center=(x + w // 2, y + h // 2),
                )
            )
        else:
            for c in row:
                if c in by_center:
                    new_lines.append(by_center[c])
    return new_lines


def sort_lines_by_threshold(
    line_mask: np.ndarray,
    lines: list[Line],
    threshold: float = 20,
    calculate_threshold: bool = True,
    group_lines: bool = True,
) -> tuple[list[Line], float]:
    """Reading-order sort + optional chunk merge (reference:
    line_detection.py:551-634 — both duplicate definitions behave like
    this)."""
    centers = [line.center for line in lines]
    line_threshold = (
        get_line_threshold(line_mask) if calculate_threshold else threshold
    )
    sorted_centers = sort_bbox_centers(centers, line_threshold=line_threshold)
    if group_lines:
        new_lines = group_line_chunks(sorted_centers, lines)
    else:
        # reference parity: its non-grouping scan has no break, so every
        # line whose center matches is appended per center occurrence
        # (line_detection.py:583-589)
        new_lines = [
            line
            for row in sorted_centers
            for c in row
            for line in lines
            if line.center == c
        ]
    return new_lines, line_threshold


# Name parity with the reference call site (inference.py:606)
sort_lines_by_threshold2 = sort_lines_by_threshold


def sort_lines_by_peaks(
    line_mask: np.ndarray,
    lines: list[Line],
    group_lines: bool = True,
) -> tuple[list[Line], float]:
    """Reading order via horizontal projection-profile peaks — the
    LineSorting.PEAKS algorithm the reference declares but never implements
    (reference: BDRC/data.py:60-64, Config.py:85 map every entry to an enum
    the code never dispatches on). Each text row shows up as a peak in the
    mask's row-sum profile; lines are grouped by their nearest peak, rows
    read top to bottom, chunks left to right. More robust than the
    threshold vote on pages with uneven inter-line gaps."""
    if line_mask.ndim == 3:
        line_mask = cv2.cvtColor(line_mask, cv2.COLOR_BGR2GRAY)
    if not lines:
        return [], 0.0

    profile = (line_mask > 0).sum(axis=1).astype(np.float64)
    heights = [line.bbox.h for line in lines]
    min_gap = max(int(np.median(heights) * 0.75), 4)
    k = max(min_gap // 2 * 2 + 1, 3)
    kernel = np.ones(k) / k
    smooth = np.convolve(profile, kernel, mode="same")

    floor = smooth.max() * 0.2
    peaks: list[int] = []
    for y in range(1, len(smooth) - 1):
        if smooth[y] < floor:
            continue
        if smooth[y] >= smooth[y - 1] and smooth[y] > smooth[y + 1]:
            if peaks and y - peaks[-1] < min_gap:
                if smooth[y] > smooth[peaks[-1]]:
                    peaks[-1] = y
                continue
            peaks.append(y)
    if not peaks:  # degenerate mask: single row
        peaks = [int(np.argmax(smooth))]

    rows: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(peaks))}
    arr = np.asarray(peaks)
    for line in lines:
        idx = int(np.argmin(np.abs(arr - line.center[1])))
        rows[idx].append(line.center)
    sorted_centers = [
        sorted(rows[i], key=lambda c: c[0])
        for i in range(len(peaks))
        if rows[i]
    ]
    if group_lines:
        new_lines = group_line_chunks(sorted_centers, lines)
    else:
        new_lines = [
            line
            for row in sorted_centers
            for c in row
            for line in lines
            if line.center == c
        ]
    return new_lines, float(min_gap)


# ---------------------------------------------------------------------------
# Misc geometry used by exporters / layout
# ---------------------------------------------------------------------------

def rotate_contour(
    cnt: np.ndarray, center: tuple[int, int], angle: float
) -> np.ndarray:
    """Rotate contour points about a center by angle degrees, polar form
    (reference: BDRC/utils.py:636-658).

    Parity detail: the reference assigns the rotated float coords back into
    the INT contour array before re-adding the center, so each coordinate is
    truncated toward zero relative to the center (not relative to origin) —
    replicated here (differs by 1 px for points left/above the center
    otherwise)."""
    cx, cy = center
    cnt_norm = cnt - [cx, cy]
    coords = cnt_norm[:, 0, :].astype(np.float64)
    thetas = np.rad2deg(np.arctan2(coords[:, 1], coords[:, 0]))
    rhos = np.hypot(coords[:, 0], coords[:, 1])
    thetas = np.deg2rad((thetas + angle) % 360)
    xs = rhos * np.cos(thetas)
    ys = rhos * np.sin(thetas)
    out = cnt_norm.copy()
    out[:, 0, 0] = xs.astype(out.dtype)
    out[:, 0, 1] = ys.astype(out.dtype)
    return (out + [cx, cy]).astype(np.int32)


def get_text_bbox(lines: list[Line]) -> BBox:
    """Text-area bbox from line bboxes (reference: BDRC/utils.py:611-621,
    including its quirky max-w/last-line-h semantics)."""
    all_bboxes = [line.bbox for line in lines]
    min_x = min(b.x for b in all_bboxes)
    min_y = min(b.y for b in all_bboxes)
    max_w = max(b.w for b in all_bboxes)
    max_h = all_bboxes[-1].y + all_bboxes[-1].h
    return BBox(min_x, min_y, max_w, max_h)


def get_union_bbox(contours: list[np.ndarray]):
    """Union axis-aligned + rotated bbox over contours
    (reference: BDRC/utils.py:1081-1097)."""
    from ocr_inference_tpu.core.data import RotatedBBox

    if len(contours) == 0:
        return None, None
    all_points = np.vstack(contours)
    x, y, w, h = geo.bounding_rect(all_points)
    bbox = BBox(x, y, w, h)
    (cx, cy), (width, height), angle = geo.min_area_rect(all_points)
    points = geo.box_points(((cx, cy), (width, height), angle)).astype(np.int32)
    return bbox, RotatedBBox((float(cx), float(cy)), width, height, angle, points)


# ---------------------------------------------------------------------------
# Coordinate rescaling between detection resolution and the original image
# (reference torch path: BDRC/utils.py:1054-1079). The batched engines run
# detection at clamped resolution; these map geometry back.
# ---------------------------------------------------------------------------

def contour_to_cv(contour) -> np.ndarray:
    """[(x, y), ...] -> cv2-shaped (N, 1, 2) int32 contour
    (reference: BDRC/utils.py:1054-1060)."""
    return np.asarray(contour, dtype=np.int32).reshape(-1, 1, 2)


def contour_to_original(contour, scale_x: float, scale_y: float):
    """Rescale [(x, y), ...] from detection to original resolution
    (reference: BDRC/utils.py:1062-1070)."""
    return [
        (int(round(x / scale_x)), int(round(y / scale_y))) for x, y in contour
    ]


def bbox_to_original(bbox, scale_x: float, scale_y: float):
    """Rescale an (x, y, w, h) rect from detection to original resolution
    (reference: BDRC/utils.py:1072-1079)."""
    x, y, w, h = bbox
    return (
        int(round(x / scale_x)),
        int(round(y / scale_y)),
        int(round(w / scale_x)),
        int(round(h / scale_y)),
    )


# ---------------------------------------------------------------------------
# Text-area analysis (layout-era helpers)
# ---------------------------------------------------------------------------

def get_text_area(image: np.ndarray, prediction: np.ndarray):
    """Biggest dilated text region -> (resized prediction, area mask,
    area contour) (reference: BDRC/utils.py:576-608)."""
    dil_kernel = np.ones((12, 2), np.uint8)
    dil_prediction = cv2.dilate(prediction, kernel=dil_kernel, iterations=10)
    prediction = cv2.resize(prediction, (image.shape[1], image.shape[0]))
    dil_prediction = cv2.resize(dil_prediction, (image.shape[1], image.shape[0]))
    contours = geo.find_contours(dil_prediction)
    if len(contours) == 0:
        return None, None, None
    areas = [geo.contour_area(x) for x in contours]
    biggest = contours[int(np.argmax(areas))]
    x, y, w, h = geo.bounding_rect(biggest)
    area_mask = np.zeros((image.shape[0], image.shape[1], 3), dtype=np.float32)
    cv2.rectangle(area_mask, (x, y), (x + w, y + h), (255, 255, 255), -1)
    area_mask = cv2.cvtColor(area_mask, cv2.COLOR_BGR2GRAY)
    return prediction, area_mask, biggest


def is_inside_rectangle(point: tuple[float, float], rect) -> bool:
    """(reference: BDRC/utils.py:661-664)."""
    x, y = point
    xmin, ymin, xmax, ymax = rect
    return xmin <= x <= xmax and ymin <= y <= ymax


def filter_contours_by_area(
    prediction: np.ndarray, textarea_contour: np.ndarray
) -> list[np.ndarray]:
    """Keep line contours whose min-area-rect center falls inside the text
    area (reference: BDRC/utils.py:667-681, named filter_contours there)."""
    x, y, w, h = geo.bounding_rect(textarea_contour)
    line_contours = geo.find_contours(prediction)
    filtered = []
    for cnt in line_contours:
        center, _, _ = geo.min_area_rect(cnt)
        if is_inside_rectangle(center, [x, y, x + w, y + h]):
            filtered.append(cnt)
    return filtered


def post_process_prediction(image: np.ndarray, prediction: np.ndarray):
    """Text-area crop + deskew of image and prediction
    (reference: BDRC/utils.py:684-701)."""
    prediction, text_area, textarea_contour = get_text_area(image, prediction)
    if prediction is None:
        return None, None, None, None
    cropped = mask_n_crop(prediction, text_area)
    angle = calculate_rotation_angle_from_lines(
        cropped[..., 0] if cropped.ndim == 3 else cropped
    )
    rotated_image = rotate_from_angle(image, angle)
    rotated_prediction = rotate_from_angle(prediction, angle)
    cx, cy = geo.moments_centroid(textarea_contour)
    rotated_contour = rotate_contour(textarea_contour, (cx, cy), angle)
    return rotated_image, rotated_prediction, rotated_contour, angle
