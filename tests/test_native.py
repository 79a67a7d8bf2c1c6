"""Native C++ library tests: geometry vs cv2, ARPA scorer vs Python twin."""

import cv2
import numpy as np
import pytest

native = pytest.importorskip("ocr_inference_tpu.native")

if not native.native_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def _mask_with_shapes():
    mask = np.zeros((120, 200), np.uint8)
    mask[20:40, 10:80] = 255      # rectangle
    mask[60:100, 120:180] = 255   # second rectangle
    cv2.circle(mask, (50, 90), 12, 255, -1)
    return mask


def test_find_contours_matches_cv2_components():
    mask = _mask_with_shapes()
    ours = native.find_contours(mask)
    ref, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    assert len(ours) == len(ref) == 3
    # match by bounding rect (order may differ)
    our_rects = sorted(native.bounding_rect(c) for c in ours)
    ref_rects = sorted(cv2.boundingRect(c) for c in ref)
    assert our_rects == ref_rects


def test_contour_area_close_to_cv2():
    mask = np.zeros((100, 100), np.uint8)
    mask[10:60, 20:90] = 255
    ours = native.find_contours(mask)[0]
    ref = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0][0]
    a_ours = native.contour_area(ours)
    a_ref = cv2.contourArea(ref)
    assert abs(a_ours - a_ref) / a_ref < 0.02
    # cv2's own area function on our contour agrees with ours
    assert abs(cv2.contourArea(ours) - a_ours) < 1e-6


def test_bounding_rect_matches_cv2():
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 100, size=(30, 1, 2)).astype(np.int32)
    assert native.bounding_rect(pts) == cv2.boundingRect(pts)


def test_convex_hull_same_point_set():
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 200, size=(50, 1, 2)).astype(np.int32)
    ours = {tuple(p) for p in native.convex_hull(pts).reshape(-1, 2)}
    ref = {tuple(p) for p in cv2.convexHull(pts).reshape(-1, 2)}
    assert ours == ref


def test_min_area_rect_area_matches_cv2():
    rng = np.random.default_rng(2)
    pts = rng.integers(0, 300, size=(40, 1, 2)).astype(np.int32)
    (_, _), (w1, h1), _ = native.min_area_rect(pts)
    (_, _), (w2, h2), _ = cv2.minAreaRect(pts)
    assert abs(w1 * h1 - w2 * h2) / max(w2 * h2, 1) < 0.05


def test_min_area_rect_angle_for_tilted_band():
    # a band tilted by ~3 degrees must report that tilt (mod 90)
    mask = np.zeros((200, 600), np.uint8)
    mask[90:110, 30:570] = 255
    m = cv2.getRotationMatrix2D((300, 100), 3.0, 1)
    mask = cv2.warpAffine(mask, m, (600, 200))
    cnt = native.find_contours(mask)[0]
    _, (w, h), angle = native.min_area_rect(cnt)
    tilt = angle % 90
    tilt = min(tilt, 90 - tilt)
    assert abs(tilt - 3.0) < 1.0


def test_native_arpa_matches_python(tmp_path):
    from ocr_inference_tpu.decode.arpa_lm import ArpaLM

    arpa = "\n".join(
        [
            "\\data\\",
            "ngram 1=4",
            "ngram 2=3",
            "",
            "\\1-grams:",
            "-0.5\ta\t-0.3",
            "-1.0\tb\t-0.2",
            "-2.0\tc\t-0.1",
            "-3.0\t<unk>",
            "",
            "\\2-grams:",
            "-0.1\ta b",
            "-2.5\ta c",
            "-0.4\tb c",
            "",
            "\\end\\",
        ]
    )
    p = tmp_path / "lm.arpa"
    p.write_text(arpa, encoding="utf-8")

    py = ArpaLM(p)
    cc = native.NativeArpaLM(p)
    assert cc.order == py.order == 2
    cases = [
        ((), "a"),
        ((), "zzz"),
        (("a",), "b"),
        (("a",), "c"),
        (("b",), "c"),
        (("c",), "a"),
        (("b", "a"), "c"),
        (("a", "b"), "c"),
    ]
    for ctx, tok in cases:
        assert cc.score(ctx, tok) == pytest.approx(py.score(ctx, tok)), (ctx, tok)


def test_native_arpa_score_fn_in_beam_search(tmp_path):
    from ocr_inference_tpu.decode.ctc import beam_search

    arpa = "\n".join(
        [
            "\\data\\",
            "ngram 1=3",
            "",
            "\\1-grams:",
            "-0.2\ta",
            "-1.5\tb",
            "-3.0\t<unk>",
            "\\end\\",
        ]
    )
    p = tmp_path / "uni.arpa"
    p.write_text(arpa, encoding="utf-8")
    lm = native.NativeArpaLM(p)
    charset = ["a", "b"]
    fn = lm.make_score_fn(charset, add_blank=True)
    logits = np.log(
        np.array([[0.01, 0.495, 0.495], [0.98, 0.01, 0.01]], np.float64)
    )
    beams = beam_search(logits, charset, add_blank=True, lm_score_fn=fn,
                        lm_alpha=1.0)
    assert beams[0].text == "a"  # LM breaks the acoustic tie
