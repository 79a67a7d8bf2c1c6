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


def test_vertical_warp_matches_exact_gather_path():
    """The global-dewarp fast path (_warp_pair_vertical, shift-select over
    a bounded row band) must match the exact gather path (_warp_pair) on an
    x-preserving TPS: same gray page within 1 intensity count, near-equal
    masks (float-order ties at the 0.5 threshold may flip lone pixels)."""
    import jax.numpy as jnp

    from ocr_inference_tpu.ops.packing import pack_bits_host, unpack_mask

    rng = np.random.default_rng(5)
    h, w = 256, 384
    img = rng.integers(0, 255, (h, w), np.uint8)
    mask = (rng.random((h, w)) > 0.6).astype(np.uint8)

    xs = np.linspace(20, w - 20, 8)
    src = np.stack([140 + 18 * np.sin(xs / 40.0), xs], -1)
    dst = np.stack([np.full(8, 140.0), xs], -1)
    corners = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64) * [h, w]
    src = np.concatenate([src, corners])
    dst = np.concatenate([dst, corners])
    control, weights, affine = T.fit_tps(src, dst)

    args = (
        jnp.asarray(img),
        jnp.asarray(pack_bits_host(mask > 0)),
        jnp.asarray(control, np.float32),
        jnp.asarray(weights, np.float32),
        jnp.asarray(affine, np.float32),
    )
    exact_img, exact_packed = T._warp_pair(*args)
    fast_img, fast_packed, max_dy = T._warp_pair_vertical(*args, b=64)
    assert float(max_dy) <= 63

    # the fitted x map is the identity for x-preserving control points
    my, mx = T._tps_grid_device(args[2], args[3], args[4], h, w)
    assert float(
        jnp.max(jnp.abs(mx - jnp.arange(w, dtype=np.float32)[None]))
    ) < 1e-3

    # edge columns excluded: the gather path's strict 2-D domain test zeroes
    # x = 0 / x = w-1 when the identity x map lands at -1e-15 / w-1+1e-15
    # (float artifact of evaluating a provably-identity TPS component); the
    # vertical path treats x as exactly identity, which is the true fit
    diff = np.abs(
        np.asarray(exact_img).astype(int) - np.asarray(fast_img).astype(int)
    )[:, 1:-1]
    assert diff.max() <= 1

    m_exact = unpack_mask(np.asarray(exact_packed), w)[:, 1:-1]
    m_fast = unpack_mask(np.asarray(fast_packed), w)[:, 1:-1]
    assert np.mean(m_exact != m_fast) < 1e-3


def test_vertical_warp_overshoot_reports_max_dy():
    """max_dy must report the true displacement so apply_global_tps can
    fall back when the band is too small."""
    import jax.numpy as jnp

    from ocr_inference_tpu.ops.packing import pack_bits_host

    h, w = 128, 128
    img = np.zeros((h, w), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    xs = np.linspace(10, w - 10, 5)
    src = np.stack([60 + 50 * np.sin(xs / 15.0), xs], -1)
    dst = np.stack([np.full(5, 60.0), xs], -1)
    corners = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64) * [h, w]
    control, weights, affine = T.fit_tps(
        np.concatenate([src, corners]), np.concatenate([dst, corners])
    )
    _, _, max_dy = T._warp_pair_vertical(
        jnp.asarray(img), jnp.asarray(pack_bits_host(mask > 0)),
        jnp.asarray(control, np.float32), jnp.asarray(weights, np.float32),
        jnp.asarray(affine, np.float32), b=32,
    )
    # control points demand up to ~50 px of displacement: the b=32 band is
    # insufficient and the kernel must say so
    assert float(max_dy) > 31


def test_host_vertical_warp_matches_device():
    """host_warp_pair_vertical (coarse-grid TPS y-map + cv2.remap, zero
    transfer bytes — the slow-transport path of apply_global_tps) must
    match the device vertical warp. The coarse 65x65 map reconstruction
    carries <=~0.15 px error, which on a worst-case random-noise image
    moves a small fraction of interpolated values; the contract is
    distributional (mean + outlier fraction + mask flips), with the map
    itself pinned to the exact TPS below."""
    import jax.numpy as jnp

    from ocr_inference_tpu.ops.packing import pack_bits_host, unpack_mask

    rng = np.random.default_rng(11)
    h, w = 256, 384
    img = rng.integers(0, 255, (h, w), np.uint8)
    mask = ((rng.random((h, w)) > 0.6) * 255).astype(np.uint8)

    xs = np.linspace(20, w - 20, 8)
    src = np.stack([140 + 18 * np.sin(xs / 40.0), xs], -1)
    dst = np.stack([np.full(8, 140.0), xs], -1)
    corners = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64) * [h, w]
    control, weights, affine = T.fit_tps(
        np.concatenate([src, corners]), np.concatenate([dst, corners])
    )

    dev_img, dev_packed, _ = T._warp_pair_vertical(
        jnp.asarray(img),
        jnp.asarray(pack_bits_host(mask > 0)),
        jnp.asarray(control, np.float32),
        jnp.asarray(weights, np.float32),
        jnp.asarray(affine, np.float32),
        b=64,
    )
    host_img, host_mask = T.host_warp_pair_vertical(
        img, mask, control, weights, affine
    )
    assert host_img.shape == (h, w) and host_img.dtype == np.uint8
    assert set(np.unique(host_mask)) <= {0, 255}

    # exclude a 3-px border: the resize upsample replicates the outer
    # half-cell of the coarse lattice (~2 px on this test-sized page,
    # ~12 px — where displacement is corner-anchored ~0 — on real pages)
    diff = np.abs(
        np.asarray(dev_img).astype(int) - host_img.astype(int)
    )[3:-3, 3:-3]
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 8).mean() < 0.01, (diff > 8).mean()

    m_dev = unpack_mask(np.asarray(dev_packed), w)[3:-3, 3:-3]
    m_host = (host_mask[3:-3, 3:-3] > 0).astype(m_dev.dtype)
    assert np.mean(m_dev != m_host) < 0.01

    # the coarse-grid y-map itself is pinned to the exact TPS evaluation
    rng2 = np.random.default_rng(3)
    pts = np.stack(
        [rng2.uniform(0, h - 1, 4000), rng2.uniform(0, w - 1, 4000)], 1
    )
    exact = T.tps_transform_points(pts, control, weights, affine)[:, 0]
    gy = np.linspace(0.0, h - 1.0, 65)
    gx = np.linspace(0.0, w - 1.0, 65)
    yy, xx = np.meshgrid(gy, gx, indexing="ij")
    coarse = T.tps_transform_points(
        np.stack([yy.ravel(), xx.ravel()], 1), control, weights, affine
    )[:, 0].reshape(65, 65)
    fy = pts[:, 0] / (h - 1) * 64
    fx = pts[:, 1] / (w - 1) * 64
    iy = np.clip(fy.astype(int), 0, 63)
    ix = np.clip(fx.astype(int), 0, 63)
    wy, wx = fy - iy, fx - ix
    approx = (
        coarse[iy, ix] * (1 - wy) * (1 - wx)
        + coarse[iy, ix + 1] * (1 - wy) * wx
        + coarse[iy + 1, ix] * wy * (1 - wx)
        + coarse[iy + 1, ix + 1] * wy * wx
    )
    assert np.abs(approx - exact).max() < 0.2


def test_apply_global_tps_host_and_device_agree():
    """OCR_TPS_HOST=1 and =0 must produce interchangeable page/mask pairs
    through the public apply_global_tps entry."""
    import os

    img, mask = _curved_line_page()
    contours = list(G.get_contours(mask))
    _, line_data = T.check_for_tps(img, contours)
    old = os.environ.get("OCR_TPS_HOST")
    try:
        os.environ["OCR_TPS_HOST"] = "0"
        di, dm = T.apply_global_tps(img, mask, line_data)
        os.environ["OCR_TPS_HOST"] = "1"
        hi, hm = T.apply_global_tps(img, mask, line_data)
    finally:
        if old is None:
            os.environ.pop("OCR_TPS_HOST", None)
        else:
            os.environ["OCR_TPS_HOST"] = old
    assert hi.shape == di.shape and hm.shape == dm.shape
    assert np.mean(np.asarray(dm) != np.asarray(hm)) < 1e-3
    # pointwise deltas concentrate on the dark-line edges (a ~0.1 px map
    # delta flips which source pixel an edge samples); bound the fraction
    assert np.mean(
        np.abs(np.asarray(di).astype(int) - hi.astype(int)) > 2
    ) < 0.02


def test_check_line_tps_roi_matches_full_page():
    """The ROI-local curvature probe must agree with the reference's
    full-page-mask formulation (forced via the degenerate fallback)."""
    img, mask = _curved_line_page()
    cnt = max(G.get_contours(mask), key=cv2.contourArea)
    got = T.check_line_tps(img, cnt)

    # full-page reference formulation, inline
    import numpy as _np

    x, y, w, h = cv2.boundingRect(cnt)
    full = _np.zeros(img.shape[:2], dtype=_np.uint8)
    cv2.drawContours(full, [cnt], 0, 255, -1)
    starts = [x, x + w // 4 - 40, x + w // 2, x + w // 2 + w // 4, x + w - 40]
    centers, heights = [], []
    for sx in starts:
        sl = full[y : y + h, sx : sx + 40]
        gx, gy, bh = T.get_global_center(sl, sx, y)
        centers.append((gx, gy))
        heights.append(bh)
    ys = [c[1] for c in centers]
    exp_curved = (max(ys) - min(ys)) > float(_np.mean(heights))

    assert got[0] == exp_curved
    if got[0]:
        assert got[1] == [[cy, cx] for cx, cy in centers]
