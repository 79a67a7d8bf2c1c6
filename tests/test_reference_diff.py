"""Differential-oracle suite: the rebuild vs the reference's OWN code.

Runs the actual reference implementation (/root/reference/BDRC, imported via
tests/reference_oracle.py with inert stubs for deps that are off these code
paths) side by side with the rebuild on randomized inputs and pins equality —
byte equality wherever the contract is bytes.

Families (VERDICT round 1, item 2):
  * mask_n_crop / strip extraction     (line_detection.py:79-359)
  * mask -> contours -> reading order  (line_detection.py:107-634)
  * image ops: binarize/preprocess/tile/stitch/pad_ocr_line (utils.py:438-899)
  * exporters: PageXML / Text / JSONL  (exporter.py:116-407)
  * dewarp curvature analysis          (image_dewarping.py:77-264)

Documented divergences (each asserted, not skipped):
  * page-skew angles: the reference's low/high split assumes cv2 4.x
    [0, 90) minAreaRect angles; under this image's cv2 5.0 ((-90, 0]) it
    returns non-positive angles and therefore never deskews. The rebuild
    normalizes tilts to (-45, 45] and recovers the true skew
    (test_skew_reference_vs_rebuild).
  * deep adaptive-k descent: k small enough that int(k_size*k) == 0 makes
    cv2.getStructuringElement raise in the reference, which then serves its
    blank fallback; the rebuild clamps the kernel to 1 px (PARITY.md).
"""

from __future__ import annotations

import copy
import json
import re

import cv2
import numpy as np
import pytest

from tests.reference_oracle import (
    load_reference,
    mask_to_contours,
    random_line_mask,
    random_page_image,
)

import ocr_inference_tpu.geometry.lines as my_lines
import ocr_inference_tpu.dewarp.tps as my_tps
from ocr_inference_tpu.core.data import BBox, Line, OCRLine
from ocr_inference_tpu.core.data import Encoding

REF = load_reference()

N_CASES = 50


def _lines_from_contours(contours, line_cls, bbox_cls):
    out = []
    for cnt in contours:
        x, y, w, h = cv2.boundingRect(cnt)
        out.append(
            line_cls(
                guid=None,
                contour=cnt,
                bbox=bbox_cls(x, y, w, h),
                center=(x + w // 2, y + h // 2),
            )
        )
    return out


# ---------------------------------------------------------------------------
# mask_n_crop + strip extraction
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(N_CASES))
def test_mask_n_crop_byte_equal(seed):
    rng = np.random.RandomState(seed)
    mask = random_line_mask(seed)
    img = random_page_image(seed, mask)
    # a random dilated sub-mask, as extraction produces
    k = int(rng.randint(3, 40))
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (k, max(k // 2, 1)))
    sub = cv2.dilate(mask, kernel)
    ref_out = REF.line_detection.mask_n_crop(img, sub)
    my_out = my_lines.mask_n_crop(img, sub)
    assert ref_out.shape == my_out.shape
    assert (ref_out == my_out).all()


@pytest.mark.parametrize("seed", range(N_CASES))
def test_extract_line_images_byte_equal(seed):
    mask = random_line_mask(seed)
    img = random_page_image(seed, mask)
    contours = mask_to_contours(mask)
    contours = REF.line_detection.filter_line_contours(img, contours)
    if not contours:
        pytest.skip("no contours survived filtering for this seed")
    # exercise the adaptive descent on half the seeds via a tight tolerance
    tol = 3 if seed % 2 == 0 else 1.05

    # Walk lines with the reference's k carry-over driving BOTH sides, so
    # the one documented divergence (the zero-height-kernel crash fallback,
    # see module docstring) cannot desynchronize later lines: when the
    # reference serves its blank fallback we assert the divergence and
    # resync, everywhere else we assert byte equality.
    cur_k = 1.7
    for cnt in contours:
        _, _, _, h = cv2.boundingRect(cnt)
        tmp_mask = np.zeros(img.shape[:2], dtype=np.uint8)
        cv2.drawContours(tmp_mask, [cnt], -1, (255, 255, 255), -1)
        ref_img, ref_k = REF.line_detection.get_line_image(
            img, tmp_mask, h, bbox_tolerance=tol, k_factor=cur_k
        )
        my_img, my_k = my_lines.get_line_image(
            img, cnt, h, bbox_tolerance=tol, k_factor=cur_k
        )
        ref_fell_back = ref_img.shape == (h, 2 * h, 3) and not ref_img.any()
        if ref_fell_back:
            # documented divergence: the rebuild clamps the kernel to 1 px
            # and returns a real (non-blank) strip
            assert my_img.size > 0 and my_img.any()
            assert ref_k == cur_k  # reference keeps the incoming k
        else:
            assert ref_img.shape == my_img.shape
            assert (ref_img == my_img).all()
            assert ref_k == my_k
        cur_k = ref_k


# ---------------------------------------------------------------------------
# mask -> contours -> reading order
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(N_CASES))
def test_geometry_pipeline_equal(seed):
    """build_raw_line_data (rotation disabled both sides via rot_threshold)
    -> filter -> build_line_data -> sort_lines_by_threshold2, all equal."""
    mask = random_line_mask(seed)
    img = random_page_image(seed, mask)

    ref_img, ref_mask, ref_cnts, _ = REF.line_detection.build_raw_line_data(
        img, mask.copy(), rot_threshold=1e9
    )
    my_img, my_mask, my_cnts, _ = my_lines.build_raw_line_data(
        img, mask.copy(), rot_threshold=1e9
    )
    assert (ref_mask == my_mask).all()
    assert (ref_img == my_img).all()
    assert len(ref_cnts) == len(my_cnts)
    for rc, mc in zip(ref_cnts, my_cnts):
        assert (rc == mc).all()

    ref_f = REF.line_detection.filter_line_contours(img, ref_cnts)
    my_f = my_lines.filter_line_contours(img, my_cnts)
    assert len(ref_f) == len(my_f)
    for rc, mc in zip(ref_f, my_f):
        assert (rc == mc).all()
    if not ref_f:
        return

    ref_lines = [REF.line_detection.build_line_data(c) for c in ref_f]
    my_ls = [my_lines.build_line_data(c) for c in my_f]
    for rl, ml in zip(ref_lines, my_ls):
        assert (rl.contour == ml.contour).all()
        assert (rl.bbox.x, rl.bbox.y, rl.bbox.w, rl.bbox.h) == (
            ml.bbox.x, ml.bbox.y, ml.bbox.w, ml.bbox.h,
        )
        assert rl.center == ml.center

    ref_sorted, ref_thr = REF.line_detection.sort_lines_by_threshold2(
        ref_mask, ref_lines
    )
    my_sorted, my_thr = my_lines.sort_lines_by_threshold2(my_mask, my_ls)
    assert ref_thr == my_thr
    assert len(ref_sorted) == len(my_sorted)
    for rl, ml in zip(ref_sorted, my_sorted):
        assert (rl.contour == ml.contour).all()
        assert rl.center == ml.center

    # the non-grouping path too (duplicate-append semantics included)
    ref_ng, _ = REF.line_detection.sort_lines_by_threshold2(
        ref_mask, ref_lines, group_lines=False
    )
    my_ng, _ = my_lines.sort_lines_by_threshold2(
        my_mask, my_ls, group_lines=False
    )
    assert len(ref_ng) == len(my_ng)
    for rl, ml in zip(ref_ng, my_ng):
        assert rl.center == ml.center


@pytest.mark.parametrize("seed", range(N_CASES))
def test_line_threshold_equal(seed):
    mask = random_line_mask(seed)
    assert REF.line_detection.get_line_threshold(mask) == \
        my_lines.get_line_threshold(mask)


@pytest.mark.parametrize("seed", range(0, N_CASES, 2))
def test_sort_bbox_centers_equal(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 25))
    centers = [
        (int(rng.randint(0, 1200)), int(rng.randint(0, 600))) for _ in range(n)
    ]
    thr = float(rng.randint(5, 40))
    assert REF.line_detection.sort_bbox_centers(centers, thr) == \
        my_lines.sort_bbox_centers(centers, thr)


@pytest.mark.parametrize("seed", range(0, 20))
def test_skew_reference_vs_rebuild(seed):
    """Documented divergence: under cv2 5.0 the reference's angle split
    (written for 4.x [0,90) conventions) yields non-positive angles, so its
    deskew gate `angle > rot_threshold` never fires; the rebuild normalizes
    (-90, 0] tilts and recovers the synthetic skew."""
    base = random_line_mask(seed)
    angle = 1.0 + (seed % 4)  # 1..4 degrees CCW
    h, w = base.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), -angle, 1)
    tilted = cv2.warpAffine(base, m, (w, h), borderValue=0)
    tilted = (tilted > 127).astype(np.uint8) * 255

    ref_angle = REF.line_detection.get_rotation_angle_from_lines(tilted)
    my_angle = my_lines.calculate_rotation_angle_from_lines(tilted)
    assert ref_angle <= 0.0  # the reference never deskews under cv2 5.x
    assert abs(my_angle - angle) < 0.75  # the rebuild recovers the skew


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(N_CASES))
def test_binarize_equal_modulo_ipp_blur(seed):
    """cv2 here routes GaussianBlur through the Intel IPP custom HAL, whose
    fixed-point kernel quantization shifts the adaptive mean by up to ~2
    counts on a minority of pixels — each such pixel can flip the 51/13
    threshold. Equality is therefore pinned up to a small bounded set of
    boundary flips (every differing pixel must be a clean 0<->255 flip and
    sit within 3 counts of the threshold)."""
    from ocr_inference_tpu.ops.imaging import binarize as my_binarize

    mask = random_line_mask(seed)
    img = random_page_image(seed, mask)
    ref_bw = REF.utils.binarize(img)
    my_bw = np.asarray(my_binarize(img))
    diff = ref_bw != my_bw
    frac = diff.mean()
    assert frac < 0.02, f"binarize diverges on {frac:.2%} of pixels"
    if diff.any():
        # every disagreement is a clean threshold flip near the boundary
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        mean = cv2.GaussianBlur(gray, (51, 51), 0,
                                borderType=cv2.BORDER_REPLICATE)
        margin = np.abs(gray.astype(int) - (mean.astype(int) - 13))
        ys, xs, _ = np.where(diff)
        assert margin[ys, xs].max() <= 3


@pytest.mark.parametrize("seed", range(N_CASES))
def test_preprocess_tile_stitch_equal(seed):
    from ocr_inference_tpu.ops import tiling as my_tiling

    rng = np.random.RandomState(seed + 77)
    h = int(rng.randint(180, 2600))
    w = int(rng.randint(300, 4500))
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)

    ref_padded, ref_px, ref_py = REF.utils.preprocess_image(img)
    plan = my_tiling.plan_page(h, w)
    assert (plan.pad_x, plan.pad_y) == (ref_px, ref_py)
    my_padded = np.asarray(my_tiling.preprocess_page(img, plan))
    assert ref_padded.shape == my_padded.shape
    if (plan.resized_h, plan.resized_w) == (h, w):
        # no resize on this page: pure pad/tile must be byte-equal
        assert (ref_padded == my_padded).all()
    else:
        # the clamp resize runs through cv2's IPP HAL whose proprietary
        # fixed-point rounding is within +-1 of exact bilinear; the rebuild
        # uses exact float bilinear (documented divergence, PARITY.md)
        assert np.abs(
            ref_padded.astype(int) - my_padded.astype(int)
        ).max() <= 1
        my_padded = ref_padded  # tile/stitch parity checked on shared bytes

    ref_tiles, ref_ysteps = REF.utils.tile_image(ref_padded)
    my_tiles = np.asarray(my_tiling.tile_page(my_padded))
    assert plan.y_steps == ref_ysteps
    assert len(ref_tiles) == my_tiles.shape[0]
    for i, t in enumerate(ref_tiles):
        assert (t == my_tiles[i]).all()

    ref_stitched = REF.utils.stitch_predictions(
        np.stack(ref_tiles), ref_ysteps
    )
    my_stitched = np.asarray(my_tiling.stitch_tiles(my_tiles, plan.y_steps))
    assert (ref_stitched == my_stitched).all()


@pytest.mark.parametrize("seed", range(N_CASES))
def test_pad_ocr_line_byte_equal(seed):
    from ocr_inference_tpu.ops.tiling import pad_ocr_line as my_pad

    rng = np.random.RandomState(seed + 555)
    h = int(rng.randint(24, 140))
    w = int(rng.randint(80, 3600))
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    padding = "white" if seed % 2 else "black"
    ref_out = REF.utils.pad_ocr_line(img, padding=padding)
    my_out = np.asarray(my_pad(img, padding=padding))
    assert ref_out.shape == my_out.shape
    # geometry (which rows/cols are padding vs content) must agree exactly;
    # content pixels may differ by +-1 from cv2's IPP-HAL resize rounding
    pad_val = 255 if padding == "white" else 0
    assert ((ref_out == pad_val) == (my_out == pad_val)).mean() > 0.99
    assert np.abs(ref_out.astype(int) - my_out.astype(int)).max() <= 1


@pytest.mark.parametrize("seed", range(N_CASES))
def test_host_utils_named_twins_byte_equal(seed):
    """The host named-function surface (ops_host) against the reference's
    own utils.py implementations on random shapes — byte equality.

    These share cv2.resize call-for-call, so even the IPP-HAL resize
    rounding cancels: the contract here is exact bytes, not ±1."""
    import ocr_inference_tpu.ops_host as host

    rng = np.random.RandomState(seed + 9100)
    h = int(rng.randint(40, 900))
    w = int(rng.randint(40, 2200))
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)

    tw, th = int(rng.randint(16, 800)), int(rng.randint(16, 800))
    assert (
        REF.utils.resize_image(img, tw, th) == host.resize_image(img, tw, th)
    ).all()
    ref_r, ref_s = REF.utils.resize_to_height(img, th)
    my_r, my_s = host.resize_to_height(img, th)
    assert ref_s == my_s and (ref_r == my_r).all()
    ref_r, ref_s = REF.utils.resize_to_width(img, tw)
    my_r, my_s = host.resize_to_width(img, tw)
    assert ref_s == my_s and (ref_r == my_r).all()

    patch = int(rng.choice([128, 256, 512]))
    assert REF.utils.calculate_steps(img, patch) == host.calculate_steps(img, patch)
    xs, ys = host.calculate_steps(img, patch)
    assert REF.utils.calculate_paddings(
        img, xs, ys, patch
    ) == host.calculate_paddings(img, xs, ys, patch)
    assert REF.utils.get_paddings(img, patch) == host.get_paddings(img, patch)
    px, py = host.get_paddings(img, patch)
    pv = int(rng.randint(0, 256))
    assert (
        REF.utils.pad_image(img, px, py, pv) == host.pad_image(img, px, py, pv)
    ).all()

    # preprocess_image across all four branches (wide-clamp / tall-clamp /
    # short-upscale / pad-only), driven by the random shape + these extremes
    for shape in [
        (h, w),
        (600, 5000),   # wide > clamp_width
        (2500, 700),   # tall > clamp_height
        (300, 900),    # short < patch 512
    ]:
        page = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        ref_out = REF.utils.preprocess_image(page)
        my_out = host.preprocess_image(page)
        assert ref_out[1:] == my_out[1:]
        assert (ref_out[0] == my_out[0]).all()

    padded = host.pad_image(img, px, py, 255)
    ref_tiles, ref_ys = REF.utils.tile_image(padded, patch)
    my_tiles, my_ys = host.tile_image(padded, patch)
    assert ref_ys == my_ys and len(ref_tiles) == len(my_tiles)
    assert all((a == b).all() for a, b in zip(ref_tiles, my_tiles))
    pred = rng.rand(len(my_tiles), patch, patch).astype(np.float32)
    assert (
        REF.utils.stitch_predictions(pred, my_ys)
        == host.stitch_predictions(pred, my_ys)
    ).all()

    theta = rng.uniform(-np.pi, np.pi, 17)
    rho = rng.uniform(0, 50, 17)
    assert np.allclose(REF.utils.pol2cart(theta, rho), host.pol2cart(theta, rho))
    x, y = host.pol2cart(theta, rho)
    assert np.allclose(REF.utils.cart2pol(x, y), host.cart2pol(x, y))

    # line-canvas padding family: strip shapes keep middle >= 0 like the
    # reference's callers do (inference.py:313-334)
    strip = rng.randint(0, 256, (int(rng.randint(24, 100)), int(rng.randint(200, 3200)), 3)).astype(np.uint8)
    padding = "white" if seed % 2 else "black"
    assert (
        REF.utils.pad_ocr_line(strip, padding=padding)
        == host.pad_ocr_line(strip, padding=padding)
    ).all()
    wide = rng.randint(0, 256, (40, 900, 3)).astype(np.uint8)
    assert (
        REF.utils.pad_to_width(wide, 1200, 100, padding)
        == host.pad_to_width(wide, 1200, 100, padding)
    ).all()
    tall = rng.randint(0, 256, (200, 60, 3)).astype(np.uint8)
    assert (
        REF.utils.pad_to_height(tall, 400, 120, padding)
        == host.pad_to_height(tall, 400, 120, padding)
    ).all()


@pytest.mark.parametrize("seed", range(0, N_CASES, 2))
def test_torch_path_coord_helpers_equal(seed):
    """The torch-path coordinate helpers (utils.py:967-1079) against their
    named rebuild twins: exact integer rescales, exact clamp scale factors
    and shapes; clamped pixels within torch-vs-cv2 bilinear rounding."""
    import torch

    import ocr_inference_tpu.ops_host as host

    rng = np.random.RandomState(seed + 4400)
    pts = [(int(x), int(y)) for x, y in rng.randint(0, 4000, (25, 2))]
    sx, sy = float(rng.uniform(0.2, 2.0)), float(rng.uniform(0.2, 2.0))
    assert REF.utils.contour_to_original(pts, sx, sy) == my_lines.contour_to_original(pts, sx, sy)
    bbox = tuple(int(v) for v in rng.randint(1, 3000, 4))
    assert REF.utils.bbox_to_original(bbox, sx, sy) == my_lines.bbox_to_original(bbox, sx, sy)
    assert (REF.utils.contour_to_cv(pts) == my_lines.contour_to_cv(pts)).all()

    for h, w in [
        (int(rng.randint(80, 2600)), int(rng.randint(80, 5000))),
        (600, 5000), (2500, 700), (300, 900), (1600, 2640),
    ]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        t = torch.from_numpy(img).permute(2, 0, 1)
        ref_img, ref_sx, ref_sy = REF.utils.resize_clamp(t)
        my_img, my_sx, my_sy = host.resize_clamp(img)
        assert (ref_sx, ref_sy) == (my_sx, my_sy)
        assert tuple(ref_img.shape[1:]) == my_img.shape[:2]
        if (ref_sx, ref_sy) == (1.0, 1.0):
            assert (my_img == img).all()
        else:
            # resampled pixel content: torch bilinear (float, rounded) vs
            # cv2 INTER_LINEAR (fixed-point) agree within rounding — the
            # measured worst case is 1 count (ADVICE r2)
            ref_px = np.clip(np.rint(ref_img.permute(1, 2, 0).numpy()), 0, 255)
            assert np.abs(ref_px - my_img.astype(np.float64)).max() <= 2


@pytest.mark.parametrize("seed", range(0, N_CASES, 2))
def test_rotate_contour_equal(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(4, 60))
    cnt = rng.randint(0, 900, (n, 1, 2)).astype(np.int32)
    center = (int(rng.randint(0, 900)), int(rng.randint(0, 500)))
    angle = float(rng.uniform(-30, 30))
    ref_out = REF.utils.rotate_contour(cnt.copy(), center, angle)
    my_out = my_lines.rotate_contour(cnt.copy(), center, angle)
    assert (ref_out == my_out).all()


# ---------------------------------------------------------------------------
# exporters
# ---------------------------------------------------------------------------

def _random_export_inputs(seed):
    mask = random_line_mask(seed)
    img = random_page_image(seed, mask)
    contours = mask_to_contours(mask)
    contours = REF.line_detection.filter_line_contours(img, contours)
    if not contours:
        pytest.skip("no contours for this seed")
    texts = []
    rng = np.random.RandomState(seed + 3)
    for i in range(len(contours)):
        n = int(rng.randint(3, 40))
        texts.append(
            "".join(chr(int(rng.randint(0x0F40, 0x0F68))) for _ in range(n))
        )
    return img, contours, texts


@pytest.mark.parametrize("seed", range(N_CASES))
@pytest.mark.parametrize("fmt", ["xml", "txt", "jsonl"])
def test_exporters_byte_equal(tmp_path, monkeypatch, seed, fmt):
    from ocr_inference_tpu.io import exporter as my_exporter

    img, contours, texts = _random_export_inputs(seed)
    fixed_time = "2026-01-01T00:00:00"
    monkeypatch.setattr(REF.exporter, "get_utc_time", lambda: fixed_time,
                        raising=False)
    monkeypatch.setattr(my_exporter, "get_utc_time", lambda: fixed_time)

    ref_dir = tmp_path / "ref"
    my_dir = tmp_path / "mine"
    ref_dir.mkdir()
    my_dir.mkdir()

    ref_lines = _lines_from_contours(
        [c.copy() for c in contours], REF.data.Line, REF.data.BBox
    )
    my_ls = _lines_from_contours([c.copy() for c in contours], Line, BBox)
    ref_ocr = [
        REF.data.OCRLine(
            guid=None, text=t, encoding=REF.data.Encoding.UNICODE,
            ctc_conf=None, logits=None, lm_scores=None,
        )
        for t in texts
    ]
    my_ocr = [
        OCRLine(guid=None, text=t, encoding=Encoding.UNICODE) for t in texts
    ]

    angle = 0.0 if seed % 3 else 1.5  # exercise the un-rotation path too
    if fmt == "xml":
        REF.exporter.PageXMLExporter(str(ref_dir)).export_lines(
            img, "page", ref_lines, ref_ocr, angle=angle
        )
        my_exporter.PageXMLExporter(str(my_dir)).export_lines(
            img, "page", my_ls, my_ocr, angle=angle
        )
        ext = "xml"
    elif fmt == "txt":
        REF.exporter.TextExporter(str(ref_dir)).export_lines(
            img, "page", ref_lines, ref_ocr
        )
        my_exporter.TextExporter(str(my_dir)).export_lines(
            img, "page", my_ls, my_ocr
        )
        ext = "txt"
    else:
        REF.exporter.JsonExporter(str(ref_dir)).export_lines(
            img, "page", ref_lines, ref_ocr, angle=angle
        )
        my_exporter.JsonExporter(str(my_dir)).export_lines(
            img, "page", my_ls, my_ocr, angle=angle
        )
        ext = "jsonl"

    ref_bytes = (ref_dir / f"page.{ext}").read_bytes()
    my_bytes = (my_dir / f"page.{ext}").read_bytes()
    assert ref_bytes == my_bytes


# ---------------------------------------------------------------------------
# dewarp curvature analysis
# ---------------------------------------------------------------------------

def _curved_mask(seed):
    """Mask with strongly curved lines so check_line_tps fires."""
    rng = np.random.RandomState(seed + 9000)
    h, w = int(rng.randint(350, 600)), int(rng.randint(800, 1300))
    mask = np.zeros((h, w), np.uint8)
    n_rows = int(rng.randint(3, 6))
    pitch = (h - 80) // n_rows
    for r in range(n_rows):
        y0 = 40 + r * pitch
        thickness = int(rng.randint(14, 26))
        amp = float(rng.uniform(0, 25))  # strong curvature on some rows
        phase = float(rng.uniform(0, 2 * np.pi))
        xs = np.arange(40, w - 40)
        ys = (y0 + amp * np.sin(xs / w * np.pi + phase)).astype(np.int32)
        for x, yc in zip(xs, ys):
            mask[max(yc, 0) : min(yc + thickness, h), x] = 255
    return mask


@pytest.mark.parametrize("seed", range(N_CASES))
def test_dewarp_analysis_equal(seed):
    mask = _curved_mask(seed)
    img = random_page_image(seed, mask)
    contours = mask_to_contours(mask)
    contours = REF.line_detection.filter_line_contours(img, contours)
    if not contours:
        pytest.skip("no contours for this seed")

    ref_ratio, ref_data = REF.dewarping.check_for_tps(img, contours)
    my_ratio, my_data = my_tps.check_for_tps(img, contours)
    assert ref_ratio == my_ratio
    assert len(ref_data) == len(my_data)
    for r, m in zip(ref_data, my_data):
        assert r["tps"] == m["tps"]
        # slice centers come from int(minAreaRect center); cv2 computes the
        # center in float32 with hull-order-dependent rounding, so a center
        # sitting within ~1e-4 of an integer can truncate differently
        # (geometry/backend.py divergence note) — coordinates must agree
        # within 1 px, y-deltas within 2
        assert abs(r["max_yd"] - m["max_yd"]) <= 2
        if r["tps"]:
            for rp, mp in zip(r["input_pts"], m["input_pts"]):
                assert abs(rp[0] - mp[0]) <= 1 and abs(rp[1] - mp[1]) <= 1
            for rp, mp in zip(r["output_pts"], m["output_pts"]):
                assert abs(rp[0] - mp[0]) <= 1 and abs(rp[1] - mp[1]) <= 1

    if any(r["tps"] for r in ref_data):
        assert REF.dewarping.get_global_tps_line(ref_data) == \
            my_tps.get_global_tps_line(my_data)
