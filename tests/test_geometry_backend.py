"""Topology backend dispatch: native C++ vs cv2 parity at the primitive and
pipeline level (VERDICT r1 item 6: native must serve the real pipeline)."""

import cv2
import numpy as np
import pytest

from ocr_inference_tpu.geometry import backend as geo
from ocr_inference_tpu.geometry.lines import (
    build_line_data,
    build_raw_line_data,
    extract_line_images,
    filter_line_contours,
    sort_lines_by_threshold,
)

try:
    from ocr_inference_tpu import native

    HAVE_NATIVE = native.native_available()
except Exception:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")


@pytest.fixture
def native_backend():
    geo.set_backend(True)
    yield
    geo.set_backend(None)


@pytest.fixture
def cv2_backend():
    geo.set_backend(False)
    yield
    geo.set_backend(None)


def _page_mask(h=400, w=900, n_lines=5, tilt=0.0):
    mask = np.zeros((h, w), np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        mask[y0 : y0 + 22, 40 : w - 40] = 255
    if tilt:
        m = cv2.getRotationMatrix2D((w / 2, h / 2), tilt, 1)
        mask = cv2.warpAffine(mask, m, (w, h))
    return mask


@needs_native
def test_find_contours_order_matches_cv2(native_backend):
    mask = _page_mask()
    ours = geo.find_contours(mask)
    geo.set_backend(False)
    ref = geo.find_contours(mask)
    assert len(ours) == len(ref)
    # cv2 returns bottom-up; the native wrapper must match that order
    our_ys = [geo.bounding_rect(c)[1] for c in ours]
    ref_ys = [cv2.boundingRect(c)[1] for c in ref]
    assert our_ys == ref_ys
    assert our_ys == sorted(our_ys, reverse=True)


@needs_native
def test_min_area_rect_cv2_convention(native_backend):
    # the native angle must be normalized to this cv2's (-90, 0] convention
    mask = np.zeros((200, 600), np.uint8)
    mask[90:110, 30:570] = 255
    m = cv2.getRotationMatrix2D((300, 100), 3.0, 1)
    mask = cv2.warpAffine(mask, m, (600, 200))
    cnt = geo.find_contours(mask)[0]
    (cx, cy), (w, h), angle = geo.min_area_rect(cnt)
    (rcx, rcy), (rw, rh), rangle = cv2.minAreaRect(cnt)
    assert -90.0 < angle <= 0.0
    assert abs(angle - rangle) < 1.5
    assert abs(w - rw) / rw < 0.02 and abs(h - rh) / rh < 0.06
    assert abs(cx - rcx) < 2 and abs(cy - rcy) < 2


@needs_native
def test_bounding_rect_accepts_images(native_backend):
    mask = _page_mask()
    assert geo.bounding_rect(mask) == tuple(cv2.boundingRect(mask))


@needs_native
def test_arc_length_and_approx_poly(native_backend):
    cnt = np.array([[[0, 0]], [[100, 0]], [[100, 50]], [[0, 50]]], np.int32)
    assert geo.arc_length(cnt, True) == pytest.approx(
        cv2.arcLength(cnt, True)
    )
    dense = []
    for i in range(4):
        a, b = cnt[i, 0], cnt[(i + 1) % 4, 0]
        for t in np.linspace(0, 1, 40, endpoint=False):
            dense.append(np.round(a + (b - a) * t))
    dense = np.asarray(dense, np.int32).reshape(-1, 1, 2)
    simplified = geo.approx_poly_dp(dense, 2.0, True)
    assert 4 <= len(simplified) <= 6  # rectangle collapses to ~its corners
    assert geo.bounding_rect(simplified) == (0, 0, 101, 51)


@needs_native
def test_box_points_matches_cv2(native_backend):
    rect = ((120.0, 80.0), (200.0, 40.0), -30.0)
    ours = geo.box_points(rect)
    ref = cv2.boxPoints(rect)
    # same corner set (order may start elsewhere)
    ours_sorted = sorted(map(tuple, np.round(ours, 3)))
    ref_sorted = sorted(map(tuple, np.round(ref, 3)))
    assert np.allclose(ours_sorted, ref_sorted, atol=1e-2)


@needs_native
@pytest.mark.parametrize("tilt", [0.0, 2.0])
def test_pipeline_geometry_ab_parity(tilt):
    """End-to-end geometry chain (deskew -> contours -> filter -> sort ->
    strip extraction) must agree between backends on synthetic pages."""
    mask = _page_mask(tilt=tilt)
    rng = np.random.default_rng(0)
    image = np.full(mask.shape + (3,), 230, np.uint8)
    image[mask > 0] = 40
    image = np.clip(
        image.astype(int) + rng.integers(-10, 10, image.shape), 0, 255
    ).astype(np.uint8)

    out = {}
    for use_native in (False, True):
        geo.set_backend(use_native)
        try:
            img_r, mask_r, contours, angle = build_raw_line_data(image, mask)
            filtered = filter_line_contours(mask_r, contours)
            lines = [build_line_data(c, optimize=False) for c in filtered]
            lines, _ = sort_lines_by_threshold(mask_r, lines)
            strips = extract_line_images(img_r, lines)
            out[use_native] = (
                angle,
                [l.bbox for l in lines],
                [s.shape for s in strips],
            )
        finally:
            geo.set_backend(None)

    a_cv, a_nat = out[False], out[True]
    assert abs(a_cv[0] - a_nat[0]) < 0.2          # skew angle
    assert len(a_cv[1]) == len(a_nat[1])           # line count
    for b_cv, b_nat in zip(a_cv[1], a_nat[1]):     # reading order + boxes
        assert abs(b_cv.x - b_nat.x) <= 2
        assert abs(b_cv.y - b_nat.y) <= 2
        assert abs(b_cv.w - b_nat.w) <= 3
        assert abs(b_cv.h - b_nat.h) <= 3
    for s_cv, s_nat in zip(a_cv[2], a_nat[2]):     # strip geometry
        assert abs(s_cv[0] - s_nat[0]) <= 3
        assert abs(s_cv[1] - s_nat[1]) <= 3


def test_cv2_fallback_available(cv2_backend):
    mask = _page_mask()
    cnts = geo.find_contours(mask)
    assert len(cnts) == 5
    assert not geo.use_native()


@needs_native
def test_line_threshold_native_matches_slice_loop():
    """The one-call native ocr_line_threshold must equal the per-slice
    Python loop (itself cv2-parity-pinned) on random, striped, empty,
    dense, and clipped-slice masks."""
    from ocr_inference_tpu.geometry.lines import get_line_threshold

    rng = np.random.default_rng(7)
    for t in range(50):
        h = int(rng.integers(6, 260))
        w = int(rng.integers(6, 800))
        kind = t % 4
        if kind == 0:
            m = (rng.random((h, w)) < 0.25).astype(np.uint8) * 255
        elif kind == 1:
            m = np.zeros((h, w), np.uint8)
            for _ in range(int(rng.integers(1, 9))):
                y0 = int(rng.integers(0, h))
                hh = int(rng.integers(1, max(2, h // 6)))
                x0 = int(rng.integers(0, w))
                ww = int(rng.integers(1, w))
                m[y0 : y0 + hh, x0 : x0 + ww] = 255
        elif kind == 2:
            m = np.zeros((h, w), np.uint8)
        else:
            m = (rng.random((h, w)) < 0.6).astype(np.uint8)  # 0/1 values
        geo.set_backend(True)
        try:
            v_native = get_line_threshold(m)
        finally:
            geo.set_backend(False)
        try:
            v_loop = get_line_threshold(m)
        finally:
            geo.set_backend(None)
        assert v_native == v_loop, (t, h, w, v_native, v_loop)
