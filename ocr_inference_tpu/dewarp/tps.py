"""Thin-plate-spline dewarping: host-side fit, device-side remap.

Replaces the reference's thin-plate-spline package + scipy map_coordinates
path (reference: BDRC/image_dewarping.py). The TPS system is a tiny (N+3)
linear solve done on host in float64; the dense pixel remap — the hot part —
runs on device through ``ops.imaging.remap`` (bilinear, strict constant
border, matching scipy's map_coordinates semantics).

Note: the reference's ``run_tps`` constructs arrays via ``npt.NDArray(...)``
(image_dewarping.py:42-46), which raises at runtime — the committed global
TPS path cannot execute. This module implements the evident intent (unit
corners scaled once to the image extent).
"""

from __future__ import annotations

from functools import partial

import cv2

from ocr_inference_tpu.geometry import backend as geo
import jax
import jax.numpy as jnp
import numpy as np

from ocr_inference_tpu.ops.imaging import remap




# ---------------------------------------------------------------------------
# TPS fit + evaluation
# ---------------------------------------------------------------------------

def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    # U(r) = r^2 log(r) = 0.5 * r^2 log(r^2); define U(0) = 0
    with np.errstate(divide="ignore", invalid="ignore"):
        out = 0.5 * r2 * np.log(r2)
    return np.where(r2 > 0, out, 0.0)


def fit_tps(
    src_pts: np.ndarray, dst_pts: np.ndarray, alpha: float = 0.5
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit a 2-D TPS mapping src -> dst with regularization alpha.

    Returns (control_points, weights (N,2), affine (3,2)). Points are
    (y, x) rows, the convention the reference's control-point builder emits
    (image_dewarping.py:175-189).
    """
    src = np.asarray(src_pts, dtype=np.float64)
    dst = np.asarray(dst_pts, dtype=np.float64)
    n = src.shape[0]

    d2 = np.square(src[:, None, :] - src[None, :, :]).sum(-1)
    k = _tps_kernel(d2) + alpha * np.eye(n)
    p = np.concatenate([np.ones((n, 1)), src], axis=1)  # (N, 3)

    a = np.zeros((n + 3, n + 3))
    a[:n, :n] = k
    a[:n, n:] = p
    a[n:, :n] = p.T
    b = np.zeros((n + 3, 2))
    b[:n] = dst

    sol = np.linalg.solve(a, b)
    return src, sol[:n], sol[n:]


def tps_transform_points(
    pts: np.ndarray,
    control: np.ndarray,
    weights: np.ndarray,
    affine: np.ndarray,
) -> np.ndarray:
    """Evaluate the fitted TPS at arbitrary (y, x) points (host)."""
    pts = np.asarray(pts, dtype=np.float64)
    d2 = np.square(pts[:, None, :] - control[None, :, :]).sum(-1)
    u = _tps_kernel(d2)
    return affine[0] + pts @ affine[1:] + u @ weights


def _tps_grid_device(
    control: jax.Array, weights: jax.Array, affine: jax.Array, h: int, w: int
) -> tuple[jax.Array, jax.Array]:
    """Evaluate the TPS over the full HxW grid on device -> (map_y, map_x)."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    pts = jnp.stack([yg, xg], axis=-1)  # (H, W, 2)

    d2 = jnp.square(pts[..., None, :] - control[None, None, :, :]).sum(-1)
    u = jnp.where(d2 > 0, 0.5 * d2 * jnp.log(jnp.maximum(d2, 1e-20)), 0.0)
    # contract over control points with an elementwise multiply + reduce
    # rather than `u @ weights`: a dot_general would force the (H, W, N)
    # kernel tensor (hundreds of MB at page resolution) to materialize in
    # HBM as a matmul operand, where the reduce form lets XLA fuse the
    # whole d2 -> U(r) -> weighted-sum chain into one loop with no big
    # intermediate (N is ~20-30 — far too skinny for the MXU to matter)
    rbf = (u[..., None] * weights[None, None]).sum(-2)  # (H, W, 2)
    out = affine[0] + pts @ affine[1:] + rbf  # (H, W, 2) as (y, x)
    return out[..., 0], out[..., 1]


def run_tps(
    image: np.ndarray | jax.Array,
    input_pts,
    output_pts,
    add_corners: bool = True,
    alpha: float = 0.5,
) -> np.ndarray:
    """Warp image with a TPS fitted on control points
    (reference: image_dewarping.py:22-74, de-bugged).

    Fits input->output on host, evaluates the map over the output grid on
    device, and bilinearly samples the image there (scipy map_coordinates
    parity, including hard zero outside the domain).
    """
    img = np.asarray(image)
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    h, w = img.shape[:2]

    src = np.asarray(input_pts, dtype=np.float64)
    dst = np.asarray(output_pts, dtype=np.float64)
    if add_corners:
        corners = np.array(
            [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float64
        ) * [h, w]
        src = np.concatenate([src, corners])
        dst = np.concatenate([dst, corners])

    control, weights, affine = fit_tps(src, dst, alpha)
    warped = _warp_one(
        jnp.asarray(img),
        jnp.asarray(control, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        jnp.asarray(affine, jnp.float32),
    )
    return np.asarray(warped)


@jax.jit
def _warp_one(img, control, weights, affine):
    h, w = img.shape[0], img.shape[1]
    map_y, map_x = _tps_grid_device(control, weights, affine, h, w)
    return remap(img, map_y, map_x)


@jax.jit
def _warp_pair(img, packed_mask, control, weights, affine):
    """One program for the page+mask pair, minimizing transfer bytes.

    The TPS grid — the (H, W, N) kernel evaluation — is computed once and
    both arrays sample it. The binary mask travels bit-packed BOTH ways
    (upload and readback); the warped page returns as GRAYSCALE (every
    downstream consumer — skew, contours, strip extraction, the binarized
    recognizer input — is gray-compatible). D2H is the dominant dewarp
    cost (measured ~10 MB/s vs 56 MB/s H2D on the bench transport). The
    reference's committed global-TPS path raises before producing anything
    (image_dewarping.py:42-46 constructs npt.NDArray), so this
    implementation defines the output contract."""
    from ocr_inference_tpu.ops.packing import pack_mask, unpack_bits_device

    h, w = img.shape[0], img.shape[1]
    map_y, map_x = _tps_grid_device(control, weights, affine, h, w)
    warped = remap(img, map_y, map_x)
    if warped.ndim == 3:
        from ocr_inference_tpu.ops.imaging import rgb_to_gray

        warped = rgb_to_gray(warped)
    mask = unpack_bits_device(packed_mask, w) * jnp.uint8(255)
    warped_mask = remap(mask, map_y, map_x)
    return warped, pack_mask(warped_mask > 0)


_IDENTITY_MAPX: dict[tuple[int, int], np.ndarray] = {}


def _identity_map_x(h: int, w: int) -> np.ndarray:
    """Cached full-res identity x-map for cv2.remap (the vertical warp
    never moves pixels horizontally)."""
    m = _IDENTITY_MAPX.get((h, w))
    if m is None:
        m = np.broadcast_to(
            np.arange(w, dtype=np.float32), (h, w)
        ).copy()
        _IDENTITY_MAPX[(h, w)] = m
    return m


def host_warp_pair_vertical(
    img_gray: np.ndarray,
    mask: np.ndarray,
    control: np.ndarray,
    weights: np.ndarray,
    affine: np.ndarray,
    grid: int = 65,
) -> tuple[np.ndarray, np.ndarray]:
    """Host twin of _warp_pair_vertical: zero device transfers.

    Over the axon relay the device vertical warp is transfer-dominated —
    measured ~120 ms H2D (gray page) + ~160 ms D2H (warped page) + ~50 ms
    (packed mask) at the r4 transport phase, against ~20 ms of actual
    device compute — so on slow transports the whole warp runs on host:
    the exact TPS y-map is evaluated on a coarse ``grid``×``grid`` lattice
    (TPS is C^1-smooth away from its centers; 65×65 bilinear
    reconstruction measured <= 0.09 px max error on global-dewarp control
    sets, tests/test_dewarp.py::test_host_vertical_warp_matches_device),
    upsampled bilinearly, and applied with cv2.remap. Mask threshold
    matches the device path's round-then-nonzero semantics
    (acc >= 0.5 keeps the pixel).

    Returns (warped_gray_u8, warped_mask_u8 in {0, 255}).
    """
    h, w = img_gray.shape[:2]
    # coarse nodes at cv2.resize's HALF-PIXEL sample centers, so the SIMD
    # resize reconstructs the exact bilinear interpolant between them (an
    # align-corners lattice would shear the map; a numpy gather upsample
    # costs ~100 ms/page on a single-core host where resize is ~15 ms).
    # TPS is analytic, so sampling at fractional/edge-replicated positions
    # is exact at the nodes; the outermost half-cell replicates, where the
    # corner-anchored displacement is ~0.
    gy = (np.arange(grid) + 0.5) * (h / grid) - 0.5
    gx = (np.arange(grid) + 0.5) * (w / grid) - 0.5
    yy, xx = np.meshgrid(gy, gx, indexing="ij")
    pts = np.stack([yy.ravel(), xx.ravel()], axis=1)
    mapped = tps_transform_points(pts, control, weights, affine)
    coarse_y = mapped[:, 0].reshape(grid, grid).astype(np.float32)
    # cv2.remap REQUIRES a CV_32F map — a float64 buffer is reinterpreted,
    # not converted, and yields garbage
    map_y = cv2.resize(coarse_y, (w, h), interpolation=cv2.INTER_LINEAR)
    map_x = _identity_map_x(h, w)
    warped = cv2.remap(
        img_gray, map_x, map_y, cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    warped_mask_f = cv2.remap(
        mask.astype(np.uint8), map_x, map_y, cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    warped_mask = ((warped_mask_f > 0) * np.uint8(255)).astype(np.uint8)
    return warped, warped_mask


def _use_host_warp() -> bool:
    """Pick the warp backend: host remap on slow transports (axon relay),
    device remap where transfers are cheap. OCR_TPS_HOST=1/0 forces;
    'auto' (default) keys on the same measured-H2D gate as the packed
    detection uploads (engines._h2d_bandwidth_mbps)."""
    import os

    v = os.environ.get("OCR_TPS_HOST", "auto").lower()
    if v in ("1", "true", "host"):
        return True
    if v in ("0", "false", "device"):
        return False
    try:
        from ocr_inference_tpu.pipeline.engines import _h2d_bandwidth_mbps

        return _h2d_bandwidth_mbps() < 250.0
    except Exception:
        return False


def _tps_grid_y(
    control: jax.Array, wy: jax.Array, ay: jax.Array, h: int, w: int
) -> jax.Array:
    """Y-component of the TPS map over the HxW grid (the vertical-warp fast
    path never evaluates the x component — see _warp_pair_vertical)."""
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    pts = jnp.stack([yg, xg], axis=-1)
    d2 = jnp.square(pts[..., None, :] - control[None, None, :, :]).sum(-1)
    u = jnp.where(d2 > 0, 0.5 * d2 * jnp.log(jnp.maximum(d2, 1e-20)), 0.0)
    return ay[0] + pts @ ay[1:] + (u * wy[None, None]).sum(-1)


@partial(jax.jit, static_argnames=("b",))
def _warp_pair_vertical(img, packed_mask, control, weights, affine, b: int):
    """Vertical-only TPS warp of the page+mask pair — the global-dewarp
    fast path.

    The global control points always preserve x (check_line_tps emits
    (x, y) -> (x, mean_y), and the corner anchors map to themselves), so
    the regularized TPS fit's x component is EXACTLY the identity (w_x = 0,
    identity affine solves the augmented system uniquely); the warp is a
    per-pixel vertical resample out[i, j] = img(map_y[i, j], j). A general
    gather for that costs ~170 ms/page on a v5e (XLA gather of 4.2M random
    points); this kernel instead accumulates over the 2b+2 possible source
    rows with dynamic-sliced row shifts — pure elementwise + contiguous
    copies, ~10x faster — exploiting that text-dewarp displacements are
    bounded (|dy| <= b-1, b chosen from the control points on host).

    Returns (warped_gray_u8, packed_mask_words, max_abs_dy). The caller
    must check max_abs_dy <= b-1 and fall back to the exact gather path
    (_warp_pair) if exceeded — sampling is only valid inside the band.
    """
    from ocr_inference_tpu.ops.packing import pack_mask, unpack_bits_device

    h, w = img.shape[0], img.shape[1]
    img_f = img.astype(jnp.float32)
    mask_f = (
        unpack_bits_device(packed_mask, w).astype(jnp.float32) * 255.0
    )
    map_y = _tps_grid_y(control, weights[:, 0], affine[:, 0], h, w)

    i_idx = jnp.arange(h, dtype=jnp.float32)[:, None]
    max_dy = jnp.max(jnp.abs(map_y - i_idx))
    y0f = jnp.floor(map_y)
    fy = map_y - y0f
    k0 = (y0f - i_idx).astype(jnp.int32)  # floor-row offset from output row
    # strict border (scipy map_coordinates mode='constant'): out-of-domain
    # coordinates produce the border value with no blending
    in_dom = (map_y >= 0) & (map_y <= h - 1)

    pad = jnp.zeros((b + 1, w), jnp.float32)
    img_p = jnp.concatenate([pad, img_f, pad])
    mask_p = jnp.concatenate([pad, mask_f, pad])

    def body(k, accs):
        acc_i, acc_m = accs
        kk = k - b  # source-row offset in [-b, b+1]
        wgt = (
            jnp.where(k0 == kk, 1.0 - fy, 0.0)
            + jnp.where(k0 + 1 == kk, fy, 0.0)
        )
        wgt = jnp.where(in_dom, wgt, 0.0)
        sh_i = jax.lax.dynamic_slice(img_p, (kk + b + 1, 0), (h, w))
        sh_m = jax.lax.dynamic_slice(mask_p, (kk + b + 1, 0), (h, w))
        return acc_i + sh_i * wgt, acc_m + sh_m * wgt

    acc_i, acc_m = jax.lax.fori_loop(
        0, 2 * b + 2, body, (jnp.zeros((h, w)), jnp.zeros((h, w)))
    )
    warped = jnp.clip(jnp.round(acc_i), 0, 255).astype(jnp.uint8)
    warped_mask = jnp.clip(jnp.round(acc_m), 0, 255).astype(jnp.uint8)
    return warped, pack_mask(warped_mask > 0), max_dy


# ---------------------------------------------------------------------------
# Curvature analysis (which lines need dewarping)
# ---------------------------------------------------------------------------

def get_global_center(slice_image: np.ndarray, start_x: int, bbox_y: int):
    """Largest-contour center of a vertical slice, in page coords
    (reference: image_dewarping.py:77-115)."""
    contours = geo.find_contours(slice_image)
    if not contours:
        cy, cx = slice_image.shape[0] // 2, slice_image.shape[1] // 2
        return start_x + cx, bbox_y + cy, slice_image.shape[0]
    areas = [geo.contour_area(c) for c in contours]
    biggest = contours[int(np.argmax(areas))]
    _, _, _, bbox_h = geo.bounding_rect(biggest)
    (cx, cy), _, _ = geo.min_area_rect(biggest)
    return start_x + int(cx), bbox_y + int(cy), bbox_h


def check_line_tps(image: np.ndarray, contour: np.ndarray, slice_width: int = 40):
    """Probe 5 vertical slices across a line; curved if the center-y spread
    exceeds the mean slice height (reference: image_dewarping.py:118-193).
    Control points straighten centers to the mean y."""
    x, y, w, h = geo.bounding_rect(contour)

    starts = [
        x,
        x + w // 4 - slice_width,
        x + w // 2,
        x + w // 2 + w // 4,
        x + w - slice_width,
    ]
    page_w = image.shape[1]
    if 0 <= min(starts) and max(starts) + slice_width <= page_w:
        # ROI-local mask: the contour's support is its bounding rect, so a
        # rect-sized canvas sees the identical slice content at O(bbox)
        # instead of O(page) (a full-page zeros+drawContours per line was
        # ~18 ms/page of the dewarp config's geometry wall). Slices whose
        # page-coord window falls outside the rect land in the margin
        # columns, which the rect canvas covers via the slice_width pad.
        x0 = max(0, min(starts))
        x1 = min(page_w, max(starts) + slice_width)
        mask = np.zeros((h, x1 - x0), dtype=np.uint8)
        cv2.drawContours(mask, [contour], 0, 255, -1, offset=(-x0, -y))
        row0, col0 = y, x0
    else:
        # degenerate geometry (negative or page-overflowing slice starts):
        # keep the reference's exact numpy slicing semantics on the full
        # page rather than emulating wraparound on a ROI
        mask = np.zeros(image.shape[:2], dtype=np.uint8)
        cv2.drawContours(mask, [contour], 0, 255, -1)
        row0 = col0 = 0
    centers = []
    heights = []
    for sx in starts:
        sl = mask[y - row0 : y - row0 + h, sx - col0 : sx - col0 + slice_width]
        gx, gy, bh = get_global_center(sl, sx, y)
        centers.append((gx, gy))
        heights.append(bh)

    ys = [c[1] for c in centers]
    max_ydelta = max(ys) - min(ys)
    mean_h = float(np.mean(heights))
    if max_ydelta > mean_h:
        target_y = round(float(np.mean(ys)))
        input_pts = [[cy, cx] for cx, cy in centers]
        output_pts = [[target_y, cx] for cx, _ in centers]
        return True, input_pts, output_pts, max_ydelta
    return False, None, None, 0.0


def check_for_tps(image: np.ndarray, line_contours: list[np.ndarray]):
    """Per-line curvature analysis; ratio = curved / total
    (reference: image_dewarping.py:196-227)."""
    line_data = []
    for cnt in line_contours:
        status, input_pts, output_pts, max_yd = check_line_tps(image, cnt)
        line_data.append(
            {
                "contour": cnt,
                "tps": status,
                "input_pts": input_pts,
                "output_pts": output_pts,
                "max_yd": max_yd,
            }
        )
    curved = [x for x in line_data if x["tps"]]
    ratio = len(curved) / len(line_contours) if line_contours else 0.0
    return ratio, line_data


def get_global_tps_line(line_data: list) -> int:
    """Pick the line whose y-delta is closest to the mean delta
    (reference: image_dewarping.py:230-264)."""
    deltas = [x["max_yd"] if x["tps"] else 0.0 for x in line_data]
    mean_delta = float(np.mean(deltas))
    best_diff = max(deltas)
    best_y = None
    for yd in deltas:
        if yd > 0:
            diff = abs(mean_delta - yd)
            if diff < best_diff:
                best_diff = diff
                best_y = yd
    if best_y is None:
        best_y = max(deltas)
    return deltas.index(best_y)


def apply_global_tps(
    image: np.ndarray, line_mask: np.ndarray, line_data: list
) -> tuple[np.ndarray, np.ndarray]:
    """Warp page + mask with the most representative curved line
    (reference: image_dewarping.py:267-289 — note it passes (output, input)
    so the fitted map pulls the straightened grid from the curved source)."""
    best_idx = get_global_tps_line(line_data)
    output_pts = line_data[best_idx]["output_pts"]
    input_pts = line_data[best_idx]["input_pts"]
    if input_pts is None or output_pts is None:
        raise ValueError("input_pts and output_pts must not be None when tps is True")

    img = np.asarray(image)
    if img.ndim == 3:
        # the warped page returns grayscale either way (see _warp_pair);
        # converting on host BEFORE upload (bit-exact cv2 op) makes the
        # transfer and the remap a third of the RGB cost
        img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    mask = np.asarray(line_mask)
    if mask.ndim == 3:
        # channels are replicated binarization output; warp one and let the
        # consumer's 2-D path skip its RGB->gray conversion (same values,
        # a third of the transfer)
        mask = mask[..., 0]
    h, w = img.shape[:2]
    src = np.asarray(output_pts, dtype=np.float64)
    dst = np.asarray(input_pts, dtype=np.float64)
    corners = np.array(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float64
    ) * [h, w]
    control, weights, affine = fit_tps(
        np.concatenate([src, corners]), np.concatenate([dst, corners])
    )
    # points are (y, x) rows: when every control point preserves x (always
    # true for the straighten-to-mean-y global points + corner anchors),
    # the fitted x map is exactly the identity and the much cheaper
    # vertical warp applies — on device (_warp_pair_vertical) when
    # transfers are cheap, fully on host (host_warp_pair_vertical, zero
    # transfer bytes) over a slow relay (VERDICT r4 item 3: the dewarp
    # config's 911 ms/page geometry wall was the warp's H2D+D2H, not its
    # compute)
    src_all = np.concatenate([src, corners])
    dst_all = np.concatenate([dst, corners])
    vertical = np.max(np.abs(src_all[:, 1] - dst_all[:, 1])) == 0

    if vertical and _use_host_warp():
        return host_warp_pair_vertical(img, mask, control, weights, affine)

    from ocr_inference_tpu.ops.packing import pack_bits_host, unpack_mask

    dev_args = (
        jnp.asarray(img),
        jnp.asarray(pack_bits_host(mask > 0)),
        jnp.asarray(control, jnp.float32),
        jnp.asarray(weights, jnp.float32),
        jnp.asarray(affine, jnp.float32),
    )
    packed_mask = None
    if vertical:
        dy_bound = float(np.max(np.abs(src_all[:, 0] - dst_all[:, 0])))
        b = max(32, -int(-(1.5 * dy_bound + 16) // 32) * 32)
        warped_img, packed_mask, max_dy = _warp_pair_vertical(
            *dev_args, b=b
        )
        if float(max_dy) > b - 1:  # TPS overshot the band: exact fallback
            packed_mask = None
    if packed_mask is None:
        warped_img, packed_mask = _warp_pair(*dev_args)
    warped_mask = (unpack_mask(np.asarray(packed_mask), w) * 255).astype(
        np.uint8
    )
    return np.asarray(warped_img), warped_mask


def get_line_images_via_local_tps(
    image: np.ndarray, line_data: list, k_factor: float = 1.7
) -> list[np.ndarray]:
    """Per-line TPS warp then strip extraction — the TPSMode.LOCAL path
    (reference: image_dewarping.py:292-342)."""
    from ocr_inference_tpu.geometry.lines import (
        get_line_image,
        get_line_image_from_mask,
    )

    current_k = k_factor
    line_images = []
    for line in line_data:
        _, _, _, bbox_h = geo.bounding_rect(line["contour"])
        if line["tps"]:
            if line["input_pts"] is None or line["output_pts"] is None:
                raise ValueError(
                    "input_pts and output_pts must not be None when tps is True"
                )
            tmp_mask = np.zeros(image.shape[:2], dtype=np.uint8)
            cv2.drawContours(tmp_mask, [line["contour"]], -1, 255, -1)
            warped_img = run_tps(image, line["output_pts"], line["input_pts"])
            warped_mask = run_tps(tmp_mask, line["output_pts"], line["input_pts"])
            warped_mask = cv2.cvtColor(warped_mask, cv2.COLOR_RGB2GRAY)
            line_img, adapted_k = get_line_image_from_mask(
                warped_img, warped_mask, bbox_h,
                bbox_tolerance=2.0, k_factor=current_k,
            )
        else:
            line_img, adapted_k = get_line_image(
                image, line["contour"], bbox_h,
                bbox_tolerance=2.0, k_factor=current_k,
            )
        line_images.append(line_img)
        if current_k != adapted_k:
            current_k = adapted_k
    return line_images
