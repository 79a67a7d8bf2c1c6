"""ONNX->Flax weight transplant, cross-validated against torch.

Builds torch replicas of the native Easter2 and UNet architectures, exports
them through the REAL TorchScript ONNX exporter (unlocked without the onnx
package by onnx/export_shim.py), then proves on the SAME weights:

  torch forward  ==  own graph executor (onnx/runner.py)
                 ==  native Flax module after transplant (onnx/transplant.py)

with per-layer max-abs diffs. This is VERDICT round-1 item 1: two
independent implementations cross-validating each other on real exporter
output (exporter idioms included: eval-mode BN folding, Gemm transB,
MatMul+Add bias fusion).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from ocr_inference_tpu.models.torch_twins import TEaster2, TUNet
from ocr_inference_tpu.onnx.export_shim import torch_export
from ocr_inference_tpu.onnx.runner import OnnxGraphFunction
from ocr_inference_tpu.onnx.transplant import transplant, verify_transplant
from ocr_inference_tpu.onnx.wire import load_model


def _easter2_case(tmp_path, fold: bool):
    torch.manual_seed(0)
    H, W, V = 16, 64, 17
    tm = TEaster2(H, W, V).eval()
    # randomize BN stats so folding actually matters
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / f"easter2_{fold}.onnx")
    torch_export(tm, torch.randn(2, H, W), path, do_constant_folding=fold)
    x = np.random.RandomState(0).randn(2, H, W).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 1)  # (B,T,V)

    from ocr_inference_tpu.models.recognition import Easter2

    module = Easter2(vocab_size=V, dtype=jnp.float32)
    return path, x, ref, module


@pytest.mark.parametrize("fold", [True, False])
def test_easter2_executor_and_transplant_match_torch(tmp_path, fold):
    path, x, ref, module = _easter2_case(tmp_path, fold)
    model = load_model(path)

    # 1) graph executor vs torch
    fn = OnnxGraphFunction(model)
    got = np.asarray(fn(fn.weights, jnp.asarray(x))[0]).transpose(0, 2, 1)
    assert np.max(np.abs(got - ref)) < 1e-3

    # 2) transplant into the native Flax module, verify per layer
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    new_vars, report = transplant(model, module, variables, jnp.asarray(x))
    out = np.asarray(module.apply(new_vars, jnp.asarray(x)))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(model, module, new_vars, x, report)
    assert report.final_max_abs_diff < 1e-3
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs, "per-layer verification matched no layers"
    assert max(diffs) < 1e-2


def test_unet_executor_and_transplant_match_torch(tmp_path):
    torch.manual_seed(1)
    tm = TUNet(width=8).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "unet.onnx")
    torch_export(tm, torch.randn(1, 3, 64, 64), path)
    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)  # NHWC

    model = load_model(path)
    fn = OnnxGraphFunction(model)
    got = np.asarray(fn(fn.weights, jnp.asarray(x))[0]).transpose(0, 2, 3, 1)
    assert np.max(np.abs(got - ref)) < 1e-3

    from ocr_inference_tpu.models.segmentation import UNet

    module = UNet(classes=1, width=8, dtype=jnp.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = module.init(jax.random.PRNGKey(0), x_nhwc)
    new_vars, report = transplant(model, module, variables, x_nhwc)
    out = np.asarray(module.apply(new_vars, x_nhwc))
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(
        model, module, new_vars, x_nhwc, report, graph_input=x
    )
    assert report.final_max_abs_diff < 1e-3
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs and max(diffs) < 1e-2


def test_easter2_attention_executor_and_transplant_match_torch(tmp_path):
    """Attention family (Easter2-Attention): validates LayerNormalization
    transplant (epsilon reconciliation), DenseGeneral head packing
    ((E,) <-> (heads, head_dim) reshapes for q/k/v/out), and the executor's
    Einsum/Softmax lowerings on real exporter output."""
    torch.manual_seed(3)
    H, W, V = 16, 64, 13
    from ocr_inference_tpu.models.torch_twins import TEaster2Attention

    tm = TEaster2Attention(H, W, V, ln_eps=1e-6).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "easter2_attn.onnx")
    torch_export(tm, torch.randn(2, H, W), path, do_constant_folding=False)
    x = np.random.RandomState(3).randn(2, H, W).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 1)  # (B,T,V)

    model = load_model(path)
    fn = OnnxGraphFunction(model)
    got = np.asarray(fn(fn.weights, jnp.asarray(x))[0]).transpose(0, 2, 1)
    assert np.max(np.abs(got - ref)) < 1e-3

    from ocr_inference_tpu.models.recognition import Easter2

    module = Easter2(vocab_size=V, variant="attention", dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    new_vars, report = transplant(model, module, variables, jnp.asarray(x))
    kinds = [e.kind for e in report.entries]
    assert kinds.count("ln") == 4  # 2 blocks x 2 LayerNorms
    out = np.asarray(module.apply(new_vars, jnp.asarray(x)))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(model, module, new_vars, x, report)
    assert report.final_max_abs_diff < 1e-3


def test_layernorm_epsilon_mismatch_is_refused(tmp_path):
    """A torch checkpoint trained with eps=1e-5 must not silently load into
    a flax module built with the 1e-6 default."""
    torch.manual_seed(4)
    from ocr_inference_tpu.models.torch_twins import TEaster2Attention

    H, W, V = 16, 32, 5
    tm = TEaster2Attention(H, W, V, depth=1, ln_eps=1e-5).eval()
    path = str(tmp_path / "eps.onnx")
    torch_export(tm, torch.randn(1, H, W), path, do_constant_folding=False)
    model = load_model(path)

    from ocr_inference_tpu.models.recognition import Easter2

    module = Easter2(vocab_size=V, variant="attention", dtype=jnp.float32)
    x = jnp.zeros((1, H, W))
    variables = module.init(jax.random.PRNGKey(0), x)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="epsilon"):
        transplant(model, module, variables, x)


def test_crnn_executor_and_transplant_match_torch(tmp_path):
    """Recurrent family: conv stack + bidirectional GRU layers. Validates
    the executor's ONNX GRU lowering (bidirectional, linear_before_reset=1)
    AND the gate-order weight mapping onto flax GRUCell on real torch
    exporter output."""
    torch.manual_seed(2)
    H, W, V, hid = 32, 64, 11, 8
    from ocr_inference_tpu.models.torch_twins import TCRNN

    tm = TCRNN(H, V, hidden=hid).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "crnn.onnx")
    torch_export(tm, torch.randn(2, 1, H, W), path)
    x = np.random.RandomState(2).randn(2, 1, H, W).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # (B, T, V)

    model = load_model(path)
    fn = OnnxGraphFunction(model)
    got = np.asarray(fn(fn.weights, jnp.asarray(x))[0])
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-3

    from ocr_inference_tpu.models.recognition import CRNN

    module = CRNN(vocab_size=V, hidden=hid, dtype=jnp.float32)
    x_flax = jnp.asarray(x[:, 0])  # (B, H, W)
    variables = module.init(jax.random.PRNGKey(0), x_flax)
    new_vars, report = transplant(model, module, variables, x_flax)
    kinds = [e.kind for e in report.entries]
    assert kinds.count("gru[d0]") == 2 and kinds.count("gru[d1]") == 2
    out = np.asarray(module.apply(new_vars, x_flax))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(
        model, module, new_vars, x_flax, report, graph_input=x
    )
    assert report.final_max_abs_diff < 1e-3
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs and max(diffs) < 1e-2


def test_deeplab_executor_and_transplant_match_torch(tmp_path):
    """Second segmentation family (DeepLabV3+, the layout/modern-book net):
    validates ResNet strided/projection blocks, ASPP dilated branches and
    image-level pooling broadcast, and the executor's bilinear Resize
    (half-pixel, explicit sizes) against torch."""
    torch.manual_seed(5)
    from ocr_inference_tpu.models.torch_twins import TDeepLabV3Plus

    tm = TDeepLabV3Plus(hw=(64, 64), classes=5).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "deeplab.onnx")
    torch_export(tm, torch.randn(1, 3, 64, 64), path)
    x = np.random.RandomState(5).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)  # NHWC

    model = load_model(path)
    fn = OnnxGraphFunction(model)
    got = np.asarray(fn(fn.weights, jnp.asarray(x))[0]).transpose(0, 2, 3, 1)
    assert np.max(np.abs(got - ref)) < 1e-3

    from ocr_inference_tpu.models.segmentation import DeepLabV3Plus

    module = DeepLabV3Plus(classes=5, dtype=jnp.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = module.init(jax.random.PRNGKey(0), x_nhwc)
    new_vars, report = transplant(model, module, variables, x_nhwc)
    out = np.asarray(module.apply(new_vars, x_nhwc))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(
        model, module, new_vars, x_nhwc, report, graph_input=x
    )
    assert report.final_max_abs_diff < 1e-3
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs and max(diffs) < 1e-2


def test_export_shim_passthrough_bytes(tmp_path):
    """The shim must hand torch's proto bytes through unmodified."""
    torch.manual_seed(0)
    m = tnn.Sequential(tnn.Conv2d(3, 4, 3, padding=1), tnn.ReLU()).eval()
    p = str(tmp_path / "tiny.onnx")
    torch_export(m, torch.randn(1, 3, 8, 8), p)
    model = load_model(p)
    assert [n.op_type for n in model.graph.nodes] == ["Conv", "Relu"]
