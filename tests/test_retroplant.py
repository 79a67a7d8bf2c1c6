"""Flax -> ONNX weight write-back (onnx/retroplant.py).

Round trip: torch twin -> real exporter ONNX -> transplant into native
Flax -> retroplant the Flax variables back into the checkpoint bytes ->
the rewritten ``.onnx`` must (a) execute identically through the graph
executor, and (b) transplant back to the exact same variables. This is
the machinery that turns natively TPU-trained weights into real ONNX
checkpoints the reference stack can run (tests/test_reference_pipeline.py).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ocr_inference_tpu.models.torch_twins import TCRNN, TEaster2, TUNet
from ocr_inference_tpu.onnx.export_shim import torch_export
from ocr_inference_tpu.onnx.retroplant import RetroplantError, write_back
from ocr_inference_tpu.onnx.runner import OnnxGraphFunction
from ocr_inference_tpu.onnx.transplant import transplant
from ocr_inference_tpu.onnx.wire import load_model


def _tree_max_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        if np.asarray(x).size
        else 0.0
        for x, y in zip(leaves_a, leaves_b)
    )


def _roundtrip(tmp_path, torch_model, sample_torch, module, sample_jax,
               out_transform=lambda a: a):
    path = str(tmp_path / "m.onnx")
    torch_export(torch_model, sample_torch, path, do_constant_folding=False)
    model = load_model(path)

    variables = module.init(jax.random.PRNGKey(0), sample_jax)
    trained, _ = transplant(model, module, variables, sample_jax)
    want = np.asarray(module.apply(trained, sample_jax))

    # write the (stand-in for natively trained) variables back into the file
    path2 = str(tmp_path / "m_back.onnx")
    mapping = write_back(path, module, trained, sample_jax, path2)
    assert mapping  # something was written

    model2 = load_model(path2)
    fn = OnnxGraphFunction(model2)
    got = out_transform(np.asarray(fn(fn.weights, jnp.asarray(sample_jax))[0]))
    assert np.max(np.abs(got - want)) < 1e-4

    # and the rewritten checkpoint transplants back to the same variables
    variables2 = module.init(jax.random.PRNGKey(1), sample_jax)
    back, _ = transplant(model2, module, variables2, sample_jax)
    assert _tree_max_diff(trained, back) == 0.0


def test_easter2_roundtrip(tmp_path):
    torch.manual_seed(0)
    H, W, V = 16, 64, 17
    tm = TEaster2(H, W, V).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    from ocr_inference_tpu.models.recognition import Easter2

    module = Easter2(vocab_size=V, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, H, W).astype(np.float32) * 0.5
    )
    # torch Easter2 emits (B, V, T); the flax module (B, T, V)
    _roundtrip(tmp_path, tm, torch.randn(2, H, W), module, x,
               out_transform=lambda a: a.transpose(0, 2, 1))


def test_unet_roundtrip(tmp_path):
    torch.manual_seed(1)
    tm = TUNet(width=8).eval()

    from ocr_inference_tpu.models.segmentation import UNet

    module = UNet(classes=1, width=8, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    )
    path = str(tmp_path / "unet.onnx")
    torch_export(tm, torch.randn(1, 3, 64, 64), path,
                 do_constant_folding=False)
    model = load_model(path)
    variables = module.init(jax.random.PRNGKey(0), x)
    trained, _ = transplant(model, module, variables, x)
    want = np.asarray(module.apply(trained, x))

    path2 = str(tmp_path / "unet_back.onnx")
    write_back(path, module, trained, x, path2)
    model2 = load_model(path2)
    fn = OnnxGraphFunction(model2)
    got = np.asarray(
        fn(fn.weights, jnp.asarray(np.transpose(np.asarray(x), (0, 3, 1, 2))))[0]
    ).transpose(0, 2, 3, 1)
    assert np.max(np.abs(got - want)) < 1e-4

    variables2 = module.init(jax.random.PRNGKey(1), x)
    back, _ = transplant(model2, module, variables2, x)
    assert _tree_max_diff(trained, back) == 0.0


def test_unet_writeback_dealiasing(tmp_path):
    """Regression: a FRESH torch twin's identical tensors (BN statistics
    all zeros/ones) are deduplicated by the exporter into shared
    initializer slots; writing back independently trained values must
    de-alias them (new initializers + re-pointed node inputs), not let
    the last writer win. Caught live: natively trained fixture weights
    produced garbage masks through the written checkpoint."""
    torch.manual_seed(4)
    tm = TUNet(width=8).eval()  # fresh BN stats -> exporter dedup

    from ocr_inference_tpu.models.segmentation import UNet

    module = UNet(classes=1, width=8, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32)
    )
    # weights UNRELATED to the export (the trained-checkpoint scenario):
    # per-leaf random values so every aliased consumer needs its own slot
    variables = module.init(jax.random.PRNGKey(7), x)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rng = np.random.RandomState(11)
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [
            jnp.asarray(
                np.asarray(l, np.float32)
                + rng.uniform(-0.05, 0.05, np.shape(l)).astype(np.float32)
            )
            for l in leaves
        ],
    )

    path = str(tmp_path / "unet.onnx")
    torch_export(tm, torch.randn(1, 3, 64, 64), path,
                 do_constant_folding=False)
    path2 = str(tmp_path / "unet_back.onnx")
    mapping = write_back(path, module, variables, x, path2)
    assert mapping.additions  # dedup happened and was de-aliased

    model2 = load_model(path2)
    want = np.asarray(module.apply(variables, x, train=False))
    fn = OnnxGraphFunction(model2)
    got = np.asarray(
        fn(fn.weights,
           jnp.asarray(np.transpose(np.asarray(x), (0, 3, 1, 2))))[0]
    ).transpose(0, 2, 3, 1)
    assert np.max(np.abs(got - want)) < 2e-2  # executor-vs-native numerics

    # and the rewritten checkpoint transplants back to the exact values
    variables2 = module.init(jax.random.PRNGKey(8), x)
    back, _ = transplant(model2, module, variables2, x)
    assert _tree_max_diff(variables, back) == 0.0


def test_crnn_folded_export_is_refused(tmp_path):
    """CRNN has no write-back path through the torchscript exporter: the
    folded export (the only one whose GRU weights are initializer-backed)
    folds every BatchNorm into its conv, which the retroplant refuses.
    The refusal must be explicit, not a silently wrong checkpoint."""
    torch.manual_seed(2)
    H, W, V = 32, 64, 13
    tm = TCRNN(H, V, hidden=16).eval()

    from ocr_inference_tpu.models.recognition import CRNN

    module = CRNN(vocab_size=V, hidden=16, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(2).rand(2, H, W).astype(np.float32)
    )
    path = str(tmp_path / "crnn.onnx")
    torch_export(tm, torch.randn(2, 1, H, W), path,
                 do_constant_folding=True)
    model = load_model(path)
    variables = module.init(jax.random.PRNGKey(0), x)
    trained, _ = transplant(model, module, variables, x)
    with pytest.raises(RetroplantError, match="do_constant_folding"):
        write_back(path, module, trained, x, str(tmp_path / "nope.onnx"))


def test_folded_export_is_refused(tmp_path):
    torch.manual_seed(3)
    H, W, V = 16, 64, 11
    tm = TEaster2(H, W, V).eval()

    from ocr_inference_tpu.models.recognition import Easter2

    module = Easter2(vocab_size=V, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(3).randn(1, H, W).astype(np.float32)
    )
    path = str(tmp_path / "folded.onnx")
    torch_export(tm, torch.randn(1, H, W), path, do_constant_folding=True)
    model = load_model(path)
    variables = module.init(jax.random.PRNGKey(0), x)
    trained, _ = transplant(model, module, variables, x)
    with pytest.raises(RetroplantError, match="do_constant_folding"):
        write_back(path, module, trained, x, str(tmp_path / "nope.onnx"))
