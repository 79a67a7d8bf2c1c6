"""Geometry layer tests on synthetic line masks."""

import cv2
import numpy as np

from ocr_inference_tpu.geometry import lines as G


def _synthetic_page(n_lines=5, h=400, w=800, line_h=24, skew=0.0):
    """Page image + line mask with n_lines horizontal dark bands."""
    img = np.full((h, w, 3), 230, dtype=np.uint8)
    mask = np.zeros((h, w), dtype=np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        img[y0 : y0 + line_h, 40 : w - 40] = 50
        mask[y0 : y0 + line_h, 40 : w - 40] = 255
    if skew:
        img = G.rotate_from_angle(img, -skew)
        mask = G.rotate_from_angle(mask, -skew)
    return img, mask


def test_rotation_angle_recovers_skew():
    _, mask = _synthetic_page(skew=3.0)
    angle = G.calculate_rotation_angle_from_lines(mask)
    assert abs(angle - 3.0) < 0.5
    _, mask0 = _synthetic_page(skew=0.0)
    assert abs(G.calculate_rotation_angle_from_lines(mask0)) < 0.2


def test_rotation_angle_empty_mask():
    assert G.calculate_rotation_angle_from_lines(np.zeros((100, 100), np.uint8)) == 0.0


def test_build_raw_line_data_deskews():
    img, mask = _synthetic_page(n_lines=4, skew=2.0)
    out_img, out_mask, contours, angle = G.build_raw_line_data(img, mask)
    assert abs(angle - 2.0) < 0.5
    assert out_mask.ndim == 3  # rgb mask, reference contract
    assert len(contours) >= 4
    # deskewed contours should be near-horizontal again
    rect_angles = [cv2.minAreaRect(c)[2] for c in contours]
    assert all(a < 1.5 or a > 88.5 for a in rect_angles)


def test_build_raw_line_data_deskews_clockwise_too():
    """Divergence from the reference's `angle > threshold` gate
    (line_detection.py:228): a clockwise skew (negative recovered angle)
    must ALSO deskew — the round-5 eval measured 5-25% CER on the skew
    direction the reference leaves uncorrected."""
    img, mask = _synthetic_page(n_lines=4, skew=-2.0)
    est = G.calculate_rotation_angle_from_lines(mask)
    assert abs(est + 2.0) < 0.5  # recovered as negative tilt
    out_img, out_mask, contours, angle = G.build_raw_line_data(img, mask)
    assert abs(angle + 2.0) < 0.5
    assert len(contours) >= 4
    resid = G.calculate_rotation_angle_from_lines(
        cv2.cvtColor(out_mask, cv2.COLOR_RGB2GRAY)
    )
    assert abs(resid) < 0.3, resid


def test_filter_line_contours_drops_fragments():
    img, mask = _synthetic_page(n_lines=3)
    mask[10:15, 100:104] = 255  # tiny blob: w < 1% page width
    contours = [c for c in G.get_contours(mask)]
    kept = G.filter_line_contours(mask, contours)
    assert len(kept) == 3


def test_sort_lines_reading_order_and_grouping():
    img, mask = _synthetic_page(n_lines=4)
    contours = G.filter_line_contours(mask, G.get_contours(mask))
    line_data = [G.build_line_data(c) for c in contours]
    sorted_lines, threshold = G.sort_lines_by_threshold(mask, line_data)
    assert len(sorted_lines) == 4
    ys = [l.center[1] for l in sorted_lines]
    assert ys == sorted(ys), "lines must come out top-to-bottom"


def test_sort_groups_split_chunks():
    # one line broken into two horizontal chunks must merge into one Line
    img = np.full((200, 600, 3), 230, dtype=np.uint8)
    mask = np.zeros((200, 600), dtype=np.uint8)
    mask[80:100, 30:280] = 255
    mask[80:100, 320:570] = 255
    mask[150:170, 30:570] = 255
    contours = G.filter_line_contours(mask, G.get_contours(mask))
    assert len(contours) == 3
    line_data = [G.build_line_data(c) for c in contours]
    sorted_lines, _ = G.sort_lines_by_threshold(mask, line_data, group_lines=True)
    assert len(sorted_lines) == 2
    assert sorted_lines[0].center[1] < sorted_lines[1].center[1]
    # merged line spans both chunks
    assert sorted_lines[0].bbox.w > 400


def test_extract_line_images_shapes():
    img, mask = _synthetic_page(n_lines=3, line_h=20)
    contours = G.filter_line_contours(mask, G.get_contours(mask))
    line_data = [G.build_line_data(c) for c in contours]
    sorted_lines, _ = G.sort_lines_by_threshold(mask, line_data)
    strips = G.extract_line_images(img, sorted_lines, default_k=1.7, bbox_tolerance=3)
    assert len(strips) == 3
    for s in strips:
        assert s.shape[0] > 0 and s.shape[1] > 600
        assert s.shape[0] <= 20 * 3 + 2  # within tolerance


def test_extract_line_roi_matches_fullpage():
    """ROI-local extraction must equal the reference's full-page variant."""
    img, mask = _synthetic_page(n_lines=2, line_h=22)
    contours = G.filter_line_contours(mask, G.get_contours(mask))
    cnt = contours[0]
    _, _, _, h = cv2.boundingRect(cnt)
    k = 1.5

    # reference-style full-page computation
    full_mask = np.zeros(img.shape[:2], dtype=np.uint8)
    cv2.drawContours(full_mask, [cnt], -1, 255, -1)
    k_size = int(h * k)
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (k_size, int(k_size * k)))
    dilated = cv2.dilate(full_mask, kernel, iterations=1)
    ref = G.mask_n_crop(img, dilated)

    ours = G._extract_line_roi(img, cnt, h, k)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_mask_n_crop():
    img = np.full((50, 60, 3), 200, np.uint8)
    mask = np.zeros((50, 60), np.uint8)
    mask[10:20, 15:45] = 255
    out = G.mask_n_crop(img, mask)
    assert out.shape == (10, 30, 3)
    assert (out == 200).all()


def test_rotate_contour_roundtrip():
    cnt = np.array([[[10, 10]], [[40, 10]], [[40, 30]], [[10, 30]]], np.int32)
    rot = G.rotate_contour(cnt, (25, 20), 90)
    back = G.rotate_contour(rot, (25, 20), -90)
    assert np.abs(back - cnt).max() <= 2


def test_get_text_bbox_and_union_bbox():
    img, mask = _synthetic_page(n_lines=2)
    contours = G.filter_line_contours(mask, G.get_contours(mask))
    line_data = [G.build_line_data(c) for c in contours]
    sorted_lines, _ = G.sort_lines_by_threshold(mask, line_data)
    bbox = G.get_text_bbox(sorted_lines)
    assert bbox.w > 600
    u_bbox, rot_bbox = G.get_union_bbox([c for c in contours])
    assert u_bbox.w >= bbox.w
    assert rot_bbox.points.shape == (4, 2)
    assert G.get_union_bbox([]) == (None, None)


def test_get_line_image_binary_search_matches_reference_loop():
    """The log-step descent must return exactly what the reference's linear
    0.1-step loop returns (strip AND adapted k), across content that
    stresses the nonzero-extent interaction."""
    import numpy as np

    from ocr_inference_tpu.geometry.lines import _LineRoi, get_line_image

    def reference_loop(image, contour, bbox_h, bbox_tolerance, k_factor):
        roi = _LineRoi(image, contour, bbox_h, k_factor)
        tmp_k = k_factor
        height, crop = roi.attempt(bbox_h, tmp_k)
        attempts = 0
        while height > bbox_h * bbox_tolerance and attempts < 10:
            tmp_k -= 0.1
            if tmp_k <= 0.1:
                break
            height, crop = roi.attempt(bbox_h, tmp_k)
            attempts += 1
        return crop(), tmp_k

    rng = np.random.default_rng(17)
    for trial in range(12):
        h, w = 400, 900
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        if trial % 3 == 0:
            img[rng.integers(0, h - 60) :][:40] = 0  # black band: nonzero matters
        if trial % 4 == 0:
            img = img[..., :1]  # single-channel page
        y0 = int(rng.integers(60, h - 120))
        x0 = int(rng.integers(10, 200))
        lw = int(rng.integers(300, w - x0 - 10))
        lh = int(rng.integers(14, 48))
        cnt = np.array(
            [[[x0, y0]], [[x0 + lw, y0]], [[x0 + lw, y0 + lh]], [[x0, y0 + lh]]],
            np.int32,
        )
        k = float(rng.choice([2.5, 1.7, 1.2, 0.6, 0.25]))
        tol = float(rng.choice([1.5, 2.5, 4.0]))
        want_img, want_k = reference_loop(img, cnt, lh, tol, k)
        got_img, got_k = get_line_image(img, cnt, lh, bbox_tolerance=tol,
                                        k_factor=k)
        assert got_k == want_k, (trial, got_k, want_k)
        assert got_img.shape == want_img.shape, trial
        assert (got_img == want_img).all(), trial


def test_sort_lines_by_peaks_matches_reading_order():
    """The PEAKS sorter (the algorithm the reference declares but never
    implements) must produce the same reading order as the threshold sort
    on well-formed pages, and keep working with uneven inter-line gaps."""
    import numpy as np
    import cv2
    from ocr_inference_tpu.geometry.lines import (
        build_line_data,
        sort_lines_by_peaks,
        sort_lines_by_threshold,
    )
    from ocr_inference_tpu.geometry import backend as geo

    mask = np.zeros((420, 900), np.uint8)
    # uneven gaps + split chunks in row 2
    rows = [(40, 70), (120, 150), (300, 330), (360, 390)]
    for i, (y0, y1) in enumerate(rows):
        if i == 1:
            cv2.rectangle(mask, (50, y0), (400, y1), 255, -1)
            cv2.rectangle(mask, (480, y0), (850, y1), 255, -1)
        else:
            cv2.rectangle(mask, (50, y0), (850, y1), 255, -1)

    contours = geo.find_contours(mask)
    lines = [build_line_data(c) for c in contours]

    p_sorted, _ = sort_lines_by_peaks(mask, lines, group_lines=True)
    t_sorted, _ = sort_lines_by_threshold(mask, lines, group_lines=True)
    assert len(p_sorted) == 4
    p_ys = [l.center[1] for l in p_sorted]
    assert p_ys == sorted(p_ys)  # top-to-bottom reading order
    assert [l.center for l in p_sorted] == [l.center for l in t_sorted]

    # ungrouped: chunks of the split row stay left-to-right
    p_ng, _ = sort_lines_by_peaks(mask, lines, group_lines=False)
    row2 = [l for l in p_ng if 100 < l.center[1] < 200]
    assert [l.center[0] for l in row2] == sorted(l.center[0] for l in row2)
