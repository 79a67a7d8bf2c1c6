"""TPS dewarping tests: fit accuracy vs scipy-grade reference, curvature
analysis, and global warp behavior."""

import cv2
import numpy as np

from ocr_inference_tpu.dewarp import tps as T
from ocr_inference_tpu.geometry import lines as G


def test_fit_tps_interpolates_control_points():
    src = np.array([[10, 10], [10, 90], [60, 50], [90, 10], [90, 90]], float)
    dst = src + np.array([[5, 0]] * 5, float)
    control, weights, affine = T.fit_tps(src, dst, alpha=0.0)
    out = T.tps_transform_points(src, control, weights, affine)
    np.testing.assert_allclose(out, dst, atol=1e-6)


def test_fit_tps_identity_affine():
    # pure translation must be represented exactly (affine part)
    src = np.random.default_rng(0).uniform(0, 100, size=(8, 2))
    dst = src + [3.0, -2.0]
    control, weights, affine = T.fit_tps(src, dst, alpha=0.0)
    pts = np.random.default_rng(1).uniform(0, 100, size=(20, 2))
    out = T.tps_transform_points(pts, control, weights, affine)
    np.testing.assert_allclose(out, pts + [3.0, -2.0], atol=1e-5)


def _curved_line_page(h=300, w=800, amp=40, line_y=150, thickness=12):
    """Page with one sine-curved dark line."""
    img = np.full((h, w, 3), 230, dtype=np.uint8)
    mask = np.zeros((h, w), dtype=np.uint8)
    xs = np.arange(40, w - 40)
    ys = (line_y + amp * np.sin((xs - 40) / (w - 80) * np.pi)).astype(int)
    for x, y in zip(xs, ys):
        img[y : y + thickness, x] = 40
        mask[y : y + thickness, x] = 255
    return img, mask


def test_check_line_tps_detects_curvature():
    img, mask = _curved_line_page()
    contours = G.get_contours(mask)
    assert len(contours) == 1
    status, input_pts, output_pts, max_yd = T.check_line_tps(img, contours[0])
    assert status is True
    assert max_yd > 30
    assert len(input_pts) == 5 and len(output_pts) == 5
    # output points all straightened to one y
    assert len({p[0] for p in output_pts}) == 1


def test_check_line_tps_straight_line_passes():
    img = np.full((200, 600, 3), 230, dtype=np.uint8)
    mask = np.zeros((200, 600), dtype=np.uint8)
    mask[90:110, 30:570] = 255
    contours = G.get_contours(mask)
    status, *_ = T.check_line_tps(img, contours[0])
    assert status is False


def test_check_for_tps_ratio():
    img, mask = _curved_line_page()
    contours = list(G.get_contours(mask))
    ratio, line_data = T.check_for_tps(img, contours)
    assert ratio == 1.0
    assert line_data[0]["tps"] is True


def test_apply_global_tps_straightens():
    img, mask = _curved_line_page()
    contours = list(G.get_contours(mask))
    _, line_data = T.check_for_tps(img, contours)
    warped_img, warped_mask = T.apply_global_tps(img, mask, line_data)
    # warped page travels back grayscale, warped mask as thresholded bits
    # (the D2H-minimizing contract; every consumer is gray/binary-ready)
    assert warped_img.shape == img.shape[:2]
    gray = warped_mask.astype(np.uint8)
    assert gray.ndim == 2
    assert set(np.unique(gray)) <= {0, 255}
    new_contours = [c for c in G.get_contours(gray) if cv2.contourArea(c) > 100]
    assert new_contours, "line must survive the warp"
    # curvature after dewarp must be much smaller than before
    _, _, _, yd_after = T.check_line_tps(warped_img, new_contours[0])
    status_after = T.check_line_tps(warped_img, new_contours[0])[0]
    assert not status_after or yd_after < 10


def test_run_tps_identity_points_is_near_identity():
    img = np.random.default_rng(2).integers(0, 255, (64, 80, 3), np.uint8)
    pts = [[10, 10], [10, 70], [32, 40], [54, 10], [54, 70]]
    warped = T.run_tps(img, pts, pts)
    diff = np.abs(warped[4:-4, 4:-4].astype(int) - img[4:-4, 4:-4].astype(int))
    assert diff.max() <= 1


def test_local_tps_extracts_strips():
    img, mask = _curved_line_page()
    contours = list(G.get_contours(mask))
    _, line_data = T.check_for_tps(img, contours)
    strips = T.get_line_images_via_local_tps(img, line_data)
    assert len(strips) == 1
    assert strips[0].shape[0] > 0 and strips[0].shape[1] > 400
