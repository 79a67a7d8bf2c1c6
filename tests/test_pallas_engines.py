"""Pallas kernels in the production engines: parity of use_pallas on/off
(VERDICT r1 item 4 — kernels must serve the real pipeline, not just tests).

On the CPU test mesh the kernels run in interpret mode, so these tests prove
semantics; the real-TPU compile is validated separately by
ops.pallas_kernels.probe_pallas (marker-gated, see bench.py).
"""

import numpy as np
import pytest

from ocr_inference_tpu.ops import imaging, pallas_kernels as pk


@pytest.fixture(scope="module")
def page():
    rng = np.random.default_rng(7)
    img = np.full((700, 1100, 3), 235, np.uint8)
    for i in range(4):
        y0 = 140 * (i + 1)
        img[y0 : y0 + 26, 60 : 1040] = rng.integers(20, 70, (26, 980, 3))
    return np.clip(
        img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
    ).astype(np.uint8)


def test_line_kernel_bit_parity_all_buckets():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for shape in [(3, 80, 512), (2, 80, 2000), (1, 80, 1024)]:
        g = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ours = np.asarray(pk.binarize_lines_pallas(jnp.asarray(g)))
        ref = np.asarray(
            jax.vmap(imaging.adaptive_threshold_gaussian)(jnp.asarray(g))
        )
        np.testing.assert_array_equal(ours, ref)


def test_tile_kernel_bit_parity():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    t = rng.integers(0, 256, size=(2, 512, 512, 3), dtype=np.uint8)
    ours = np.asarray(pk.binarize_tiles_pallas(jnp.asarray(t)))
    ref = np.asarray(jax.vmap(imaging.binarize)(jnp.asarray(t)))[..., 0]
    np.testing.assert_array_equal(ours, ref)


def test_line_kernel_applicability_gate():
    assert pk.line_kernel_applicable(80, 512)
    assert pk.line_kernel_applicable(80, 3000)
    assert not pk.line_kernel_applicable(80, 127)   # too narrow
    assert not pk.line_kernel_applicable(80, 1009)  # prime width
    assert pk._window_block(2000) == 500
    assert pk._window_block(1024) == 512


def test_segmentation_engine_pallas_parity(page):
    from tests.test_pipeline import DensityLineModel

    from ocr_inference_tpu.models.params import init_segmentation
    from ocr_inference_tpu.pipeline.engines import SegmentationEngine

    model = DensityLineModel()
    variables = init_segmentation(model)
    ref = SegmentationEngine(model, variables, mode="line", use_pallas=False)
    pal = SegmentationEngine(model, variables, mode="line", use_pallas=True)
    np.testing.assert_array_equal(pal.predict(page), ref.predict(page))


def test_recognition_engine_pallas_parity(page):
    import jax.numpy as jnp

    from ocr_inference_tpu.core.data import (
        BatchConfig,
        CharsetEncoder,
        OCRModelConfig,
    )
    from ocr_inference_tpu.models import Easter2
    from ocr_inference_tpu.models.params import init_recognizer
    from ocr_inference_tpu.pipeline.engines import RecognitionEngine

    charset = list("abcdefghij")
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=2000,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=charset, add_blank=True, version="t",
    )
    model = Easter2(vocab_size=len(charset) + 1, dtype=jnp.float32)
    variables = init_recognizer(model, 80, 256)
    bc = BatchConfig(max_lines_per_batch=8, width_buckets=(512, 2000))
    rng = np.random.default_rng(3)
    strips = [
        rng.integers(0, 256, size=(60, w, 3), dtype=np.uint8)
        for w in (300, 900, 1800)
    ]
    # pack_input=False so binarize actually runs on device — the packed
    # upload path would bypass the kernel under test in both engines
    ref = RecognitionEngine(model, variables, cfg, batch_cfg=bc,
                            use_pallas=False, pack_input=False)
    pal = RecognitionEngine(model, variables, cfg, batch_cfg=bc,
                            use_pallas=True, pack_input=False)
    assert pal.run_batch(strips) == ref.run_batch(strips)
