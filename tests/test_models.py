"""Model zoo shape/behavior tests (CPU, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_inference_tpu.models import CRNN, DeepLabV3Plus, Easter2, UNet, build_recognizer


def _init_and_run(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=train)
    return variables, out


def test_unet_shapes():
    model = UNet(classes=1, width=8, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    _, out = _init_and_run(model, x)
    assert out.shape == (2, 64, 64, 1)
    assert out.dtype == jnp.float32


def test_unet_stem_stride_shapes():
    """Space-to-depth stem variant keeps the (B, H, W, classes) contract."""
    model = UNet(classes=1, width=8, stem_stride=2, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    _, out = _init_and_run(model, x)
    assert out.shape == (2, 64, 64, 1)
    assert out.dtype == jnp.float32


def test_unet_stem_stride_roundtrips_through_builder(tmp_path):
    """width/stem_stride saved in the weight sidecar must rebuild the exact
    trained architecture (pipeline/builder.py build_detection_engine)."""
    from ocr_inference_tpu.core.data import LineDetectionConfig
    from ocr_inference_tpu.models.params import save_params
    from ocr_inference_tpu.pipeline.builder import build_detection_engine

    model = UNet(classes=1, width=8, stem_stride=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    save_params(variables, tmp_path / "lines.msgpack",
                meta={"architecture": "unet", "width": 8, "stem_stride": 2})
    cfg = LineDetectionConfig(
        checkpoint="", onnx_file=str(tmp_path / "lines.onnx"),
        architecture="unet", patch_size=64, classes=["line"],
    )
    engine = build_detection_engine(cfg)
    assert engine.model.width == 8
    assert engine.model.stem_stride == 2
    # stem2 detectors get the narrow-component opening (tile-edge artifact
    # cleanup, see SegmentationEngine.open_width_frac); stride-1 must not
    assert engine.open_width_frac == 0.02


def test_deeplab_shapes():
    model = DeepLabV3Plus(classes=5, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 64, 64, 5)


@pytest.mark.parametrize("arch", ["Easter2", "Easter2-Attention", "CRNN"])
def test_recognizers_output_time_major_logits(arch):
    vocab = 30
    model = build_recognizer(arch, vocab, dtype=jnp.float32)
    x = jnp.zeros((2, 80, 256))  # (B, H, W) in [-1, 1]
    _, out = _init_and_run(model, x)
    assert out.shape == (2, 64, vocab)  # T = W // 4
    assert out.dtype == jnp.float32


def test_easter2_accepts_channel_dim():
    model = Easter2(vocab_size=12, dtype=jnp.float32)
    x = jnp.zeros((1, 1, 80, 128))
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 32, 12)


def test_recognizer_jit_and_determinism():
    model = Easter2(vocab_size=8, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 80, 128)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    f = jax.jit(lambda v, a: model.apply(v, a, train=False))
    out1 = np.asarray(f(variables, x))
    out2 = np.asarray(f(variables, x))
    np.testing.assert_array_equal(out1, out2)


def test_build_recognizer_unknown():
    with pytest.raises(ValueError):
        build_recognizer("nope", 10)
