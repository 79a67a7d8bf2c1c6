"""Cross-runtime end-to-end validation of the torch-CPU baseline pipeline.

bench_torch_baseline.py re-implements the reference's execution model
(BDRC/inference.py detection/geometry/per-line recognition) in torch eager
CPU as the bench's independent-runtime baseline. Here the SAME weights run
through both runtimes — torch twins exported with the real TorchScript ONNX
exporter, transplanted into the native Flax modules (onnx/transplant.py) —
and the two pipelines must agree:

  detection:   torch mask ~= SegmentationEngine mask (same geometry result)
  recognition: identical strips -> identical text, torch vs RecognitionEngine
  end-to-end:  run_page(torch) == OCRPipeline.run_ocr texts

This is stronger than the per-layer numeric checks in test_transplant.py:
it proves the baseline being benchmarked against is computing the same
function as the framework, stage boundaries and host ops included.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import linen as nn

import bench_torch_baseline as tb
from ocr_inference_tpu.core.data import (
    BatchConfig,
    CharsetEncoder,
    Encoding,
    OCRModelConfig,
    OpStatus,
)
from ocr_inference_tpu.models.recognition import Easter2
from ocr_inference_tpu.models.segmentation import UNet
from ocr_inference_tpu.models.torch_twins import TEaster2
from ocr_inference_tpu.onnx.export_shim import torch_export
from ocr_inference_tpu.onnx.transplant import transplant
from ocr_inference_tpu.onnx.wire import load_model
from ocr_inference_tpu.pipeline import (
    OCRPipeline,
    RecognitionEngine,
    SegmentationEngine,
)

CHARSET = list("abcdefghijklmnopqrstuvwxyz")
REC_W, REC_H = 512, 80
UNET_WIDTH = 4


class FlaxBenchDet:
    """Flax twin of bench_torch_baseline.TBenchLineModel: transplanted UNet
    + the same deterministic density head. Duck-types the ``.apply`` the
    SegmentationEngine calls."""

    def __init__(self, unet: UNet):
        self.unet = unet

    def apply(self, variables, x, train: bool = False):
        logits = self.unet.apply(variables, x, train=train)
        dark = 1.0 - jnp.mean(x, axis=-1, keepdims=True)
        d = nn.avg_pool(dark, (9, 1), strides=(1, 1), padding="SAME")
        d = nn.avg_pool(d, (1, 41), strides=(1, 1), padding="SAME")
        return logits * 1e-6 + (d - 0.35) * 40.0


def make_page(h: int = 512, w: int = 1024, n_lines: int = 3) -> np.ndarray:
    rng = np.random.default_rng(5)
    img = np.full((h, w, 3), 235, np.uint8)
    img = np.clip(
        img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
    ).astype(np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        img[y0 : y0 + 30, 60 : w - 60] = rng.integers(
            20, 70, (30, w - 120, 3)
        )
    return img


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    """Torch det/rec models + Flax twins carrying the SAME weights."""
    tmp = tmp_path_factory.mktemp("xrt")
    torch.manual_seed(3)
    det_t = tb.TBenchLineModel(width=UNET_WIDTH).eval()
    rec_t = TEaster2(REC_H, REC_W, len(CHARSET) + 1).eval()
    # randomized BN stats: transplant must carry running stats, not defaults
    with torch.no_grad():
        for m in list(det_t.modules()) + list(rec_t.modules()):
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    unet_path = str(tmp / "unet.onnx")
    torch_export(det_t.unet, torch.randn(1, 3, 64, 64), unet_path)
    unet = UNet(classes=1, width=UNET_WIDTH, dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    det_vars = unet.init(jax.random.PRNGKey(0), x0)
    det_vars, _ = transplant(load_model(unet_path), unet, det_vars, x0)

    rec_path = str(tmp / "easter2.onnx")
    torch_export(rec_t, torch.randn(1, REC_H, REC_W), rec_path)
    rec = Easter2(vocab_size=len(CHARSET) + 1, dtype=jnp.float32)
    r0 = jnp.zeros((1, REC_H, REC_W), jnp.float32)
    rec_vars = rec.init(jax.random.PRNGKey(0), r0)
    rec_vars, _ = transplant(load_model(rec_path), rec, rec_vars, r0)

    return det_t, rec_t, (unet, det_vars), (rec, rec_vars)


def build_engines(models):
    det_t, rec_t, (unet, det_vars), (rec, rec_vars) = models
    det_engine = SegmentationEngine(
        FlaxBenchDet(unet), det_vars, mode="line",
        use_pallas=False, pack_input=False, fused_page=False,
    )
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=REC_W,
        input_height=REC_H, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=CHARSET, add_blank=True, version="xrt",
    )
    rec_engine = RecognitionEngine(
        rec, rec_vars, cfg,
        batch_cfg=BatchConfig(width_buckets=(REC_W,), max_lines_per_batch=4),
        pack_input=True,  # host cv2 binarize == the torch path's input bytes
    )
    return det_engine, rec_engine


def test_detection_cross_runtime(models):
    det_t, *_ = models
    det_engine, _ = build_engines(models)
    page = make_page()
    torch_mask = tb.detect_page(det_t, page)
    our_mask = det_engine.predict(page)
    assert torch_mask.shape == our_mask.shape
    agree = float(np.mean(torch_mask == our_mask))
    assert agree > 0.999, f"mask agreement {agree}"
    # the masks must induce the same geometry: same contour count, and the
    # full sort must resolve both to the page's 3 drawn lines (one visual
    # line may split into several raw contours; sorting groups them)
    from ocr_inference_tpu.geometry.lines import (
        build_line_data,
        build_raw_line_data,
        filter_line_contours,
        sort_lines_by_threshold,
    )

    def line_counts(mask):
        _, rot_mask, contours, _ = build_raw_line_data(page, mask)
        filtered = filter_line_contours(rot_mask, contours)
        lines = [build_line_data(c) for c in filtered]
        sorted_lines, _ = sort_lines_by_threshold(rot_mask, lines)
        return len(filtered), len(sorted_lines)

    n_t, s_t = line_counts(torch_mask)
    n_o, s_o = line_counts(our_mask)
    assert (n_t, s_t) == (n_o, s_o)
    assert s_t == 3


def test_recognition_cross_runtime(models):
    det_t, rec_t, *_ = models
    _, rec_engine = build_engines(models)
    page = make_page()
    mask = tb.detect_page(det_t, page)
    from ocr_inference_tpu.geometry.lines import (
        build_line_data,
        build_raw_line_data,
        extract_line_images,
        filter_line_contours,
        sort_lines_by_threshold,
    )

    rot_img, rot_mask, contours, _ = build_raw_line_data(page, mask)
    filtered = filter_line_contours(rot_mask, contours)
    lines = [build_line_data(c) for c in filtered]
    sorted_lines, _ = sort_lines_by_threshold(rot_mask, lines)
    strips = extract_line_images(rot_img, sorted_lines, 2.5, 4.0)
    assert len(strips) == 3

    torch_texts = [
        tb.recognize_line(rec_t, s, CHARSET, REC_W, REC_H) for s in strips
    ]
    our_texts = rec_engine.run_batch(strips)
    assert torch_texts == our_texts
    assert any(t for t in torch_texts)  # random weights still emit tokens


def test_e2e_cross_runtime(models):
    det_t, rec_t, *_ = models
    det_engine, rec_engine = build_engines(models)
    page = make_page()
    torch_texts = [
        t.strip().replace("§", " ")
        for t in tb.run_page(det_t, rec_t, CHARSET, page)
    ]
    pipeline = OCRPipeline(rec_engine, det_engine)
    status, res = pipeline.run_ocr(page, target_encoding=Encoding.WYLIE)
    assert status == OpStatus.SUCCESS, res
    our_texts = [l.text for l in res[2]]
    assert torch_texts == our_texts
