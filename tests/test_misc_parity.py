"""Parity tests for the long-tail utility surface (previews, text-area,
dataset)."""

import cv2
import numpy as np

from ocr_inference_tpu.core.data import BBox, RotatedBBox
from ocr_inference_tpu.geometry.lines import (
    filter_contours_by_area,
    get_text_area,
    is_inside_rectangle,
    post_process_prediction,
)
from ocr_inference_tpu.io import ImageInferenceDataset
from ocr_inference_tpu.utils import (
    create_layout_preview,
    create_preview_image,
    draw_bbox,
    draw_rotated_bbox,
    generate_line_preview,
)


def _page_with_lines():
    img = np.full((300, 500, 3), 230, np.uint8)
    pred = np.zeros((300, 500), np.uint8)
    for y in (80, 160, 240):
        pred[y : y + 18, 50:450] = 255
    return img, pred


def test_get_text_area_and_filter():
    img, pred = _page_with_lines()
    out_pred, area_mask, contour = get_text_area(img, pred)
    assert out_pred is not None
    assert area_mask.max() == 255
    kept = filter_contours_by_area(pred, contour)
    assert len(kept) == 3
    assert is_inside_rectangle((100, 100), [0, 0, 500, 300])
    assert not is_inside_rectangle((600, 100), [0, 0, 500, 300])


def test_get_text_area_empty():
    img = np.zeros((50, 50, 3), np.uint8)
    assert get_text_area(img, np.zeros((50, 50), np.uint8)) == (None, None, None)


def test_post_process_prediction():
    img, pred = _page_with_lines()
    rimg, rpred, rcontour, angle = post_process_prediction(img, pred)
    assert rimg.shape == img.shape
    assert abs(angle) < 1.0


def test_previews_draw():
    img, pred = _page_with_lines()
    contours, _ = cv2.findContours(pred, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    preview = generate_line_preview(pred, list(contours))
    assert preview.max() == 255
    blended = create_preview_image(img.copy(), line_predictions=list(contours))
    assert blended.shape == img.shape
    draw_bbox(img, BBox(10, 10, 50, 20))
    draw_rotated_bbox(
        img,
        RotatedBBox((30.0, 30.0), 20, 10, 15.0,
                    np.array([[10, 10], [50, 10], [50, 30], [10, 30]], np.int32)),
    )


def test_layout_preview():
    img, pred = _page_with_lines()
    layout = np.zeros((300, 500, 3), np.uint8)
    layout[:, :, 2] = pred  # "line" channel at index 2
    out = create_layout_preview(
        img.copy(), layout, ["background", "image", "line"]
    )
    assert out.shape == img.shape


def test_image_inference_dataset(tmp_path):
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"p{i}.png"),
                    np.full((20, 30, 3), i * 10, np.uint8))
    (tmp_path / "notes.txt").write_text("skip me")
    ds = ImageInferenceDataset(str(tmp_path))
    assert len(ds) == 3
    img, meta = ds[0]
    assert meta["image_name"] == "p0.png"
    assert meta["orig_shape"] == (20, 30)
    items = list(ds.iter_prefetched(num_workers=2))
    assert len(items) == 3
    assert items[2][1]["image_name"] == "p2.png"
