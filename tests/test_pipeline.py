"""End-to-end pipeline integration tests with deterministic toy models.

The detection "model" is a fixed density filter (dark-band detector) so the
synthetic pages produce real masks; the recognizer is a tiny random Easter2
(text content is garbage, but shapes/flow/ordering are fully exercised).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ocr_inference_tpu.core.data import (
    BatchConfig,
    CharsetEncoder,
    Encoding,
    LineDetectionConfig,
    OCRModelConfig,
    OpStatus,
)
from ocr_inference_tpu.models import Easter2
from ocr_inference_tpu.models.params import init_recognizer
from ocr_inference_tpu.pipeline import (
    OCRPipeline,
    RecognitionEngine,
    SegmentationEngine,
    pad_ocr_line_host,
)


class DensityLineModel(nn.Module):
    """Deterministic line detector: box-filter darkness -> logits."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        dark = 1.0 - jnp.mean(x, axis=-1, keepdims=True)  # (B, H, W, 1)
        window = (9, 41)
        density = nn.avg_pool(dark, window, strides=(1, 1), padding="SAME")
        return (density - 0.35) * 40.0  # logits > 0 where dark band


CHARSET = list("abcdefghijklmnopqrstuvwxyz'§/ ")


def _page(n_lines=4, h=600, w=1200, line_h=28):
    img = np.full((h, w, 3), 235, dtype=np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        img[y0 : y0 + line_h, 60 : w - 60] = 40
    return img


@pytest.fixture(scope="module")
def engines():
    det_model = DensityLineModel()
    det_vars = det_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)), train=False
    )
    det = SegmentationEngine(det_model, det_vars, mode="line", tile_chunk=8)

    cfg = OCRModelConfig(
        model_file="",
        architecture="Easter2",
        input_width=2000,
        input_height=80,
        input_layer="input",
        output_layer="output",
        squeeze_channel=True,
        swap_hw=False,
        encoder=CharsetEncoder.WYLIE,
        charset=CHARSET,
        add_blank=True,
        version="test",
    )
    rec_model = Easter2(vocab_size=len(CHARSET) + 1, dtype=jnp.float32)
    rec_vars = init_recognizer(rec_model, 80, 256)
    rec = RecognitionEngine(
        rec_model,
        rec_vars,
        cfg,
        batch_cfg=BatchConfig(width_buckets=(512, 1024), max_lines_per_batch=8),
    )
    return det, rec


def test_detection_engine_masks_lines(engines):
    det, _ = engines
    img = _page(n_lines=3)
    mask = det.predict(img)
    assert mask.shape == img.shape[:2]
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    # mask must cover the dark bands and not the background
    assert mask[300, 600] == 255 or mask[299, 600] == 255
    assert mask[30, 600] == 0


def test_pad_ocr_line_host_shapes():
    strip = np.full((40, 700, 3), 128, np.uint8)
    out = pad_ocr_line_host(strip, 2000, 80)
    assert out.shape == (80, 2000, 3)
    tall = np.full((200, 300, 3), 128, np.uint8)
    out2 = pad_ocr_line_host(tall, 2000, 80)
    assert out2.shape == (80, 2000, 3)


def test_recognition_engine_batches(engines):
    _, rec = engines
    rng = np.random.default_rng(0)
    lines = [
        rng.integers(0, 255, size=(40, rng.integers(200, 900), 3), dtype=np.uint8)
        for _ in range(5)
    ]
    texts = rec.run_batch(lines)
    assert len(texts) == 5
    assert all(isinstance(t, str) for t in texts)
    # empty line images are skipped but keep their slot
    texts2 = rec.run_batch([np.zeros((0, 10, 3), np.uint8)] + lines)
    assert texts2[0] == ""
    assert len(texts2) == 6


def test_recognition_engine_beams(engines):
    _, rec = engines
    line = np.random.default_rng(1).integers(0, 255, (40, 400, 3), np.uint8)
    beams = rec.run_batch_beams([line], top_k=5)
    assert len(beams) == 1
    assert len(beams[0]) <= 5
    if beams[0]:
        assert hasattr(beams[0][0], "logit_score")


def test_full_pipeline_run_ocr(engines):
    det, rec = engines
    pipeline = OCRPipeline(rec, det)
    img = _page(n_lines=4)
    status, result = pipeline.run_ocr(img)
    assert status == OpStatus.SUCCESS, result
    rot_mask, sorted_lines, ocr_lines, angle = result
    assert len(sorted_lines) == 4
    assert len(ocr_lines) == 4
    assert abs(angle) < 1.0
    # reading order: top to bottom
    ys = [l.center[1] for l in sorted_lines]
    assert ys == sorted(ys)
    assert all(o.encoding == "UNICODE" for o in ocr_lines)


def test_full_pipeline_eval_mode(engines):
    det, rec = engines
    pipeline = OCRPipeline(rec, det)
    img = _page(n_lines=2)
    status, result = pipeline.run_ocr(img, eval_mode=True)
    assert status == OpStatus.SUCCESS, result
    _, _, ocr_lines, _ = result
    assert len(ocr_lines) == 2
    for line in ocr_lines:
        assert line.ctc_conf is not None
        assert 0.0 <= line.ctc_conf <= 1.0
        assert line.logits is not None


def test_pipeline_blank_page_fails_gracefully(engines):
    det, rec = engines
    pipeline = OCRPipeline(rec, det)
    blank = np.full((600, 1200, 3), 235, np.uint8)
    status, result = pipeline.run_ocr(blank)
    assert status == OpStatus.FAILED
    assert isinstance(result, str)


def test_pipeline_none_image(engines):
    det, rec = engines
    pipeline = OCRPipeline(rec, det)
    status, result = pipeline.run_ocr(None)
    assert status == OpStatus.FAILED
