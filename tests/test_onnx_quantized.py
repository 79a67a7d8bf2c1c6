"""Quantized-checkpoint dialect: int8 initializers + Q/DQ (round 4).

The reference's model repos ship fp32 ONNX checkpoints (Config.py:18-35),
but the standard HF size-reduction variant stores weights as int8 +
DequantizeLinear (per-tensor or per-channel scale/zero-point) and wraps
activations in QuantizeLinear/DequantizeLinear (QDQ) pairs. This family
pins both halves of the framework's support:

- ``wire.fold_dequantize`` (called by ``load_model``) folds
  weight-DequantizeLinear into plain float32 initializers, so the executor
  AND the weight transplanter see an fp32-shaped graph;
- the runtime ``QuantizeLinear``/``DequantizeLinear`` ops execute QDQ
  activation pairs (round half-to-even, zero-point-dtype saturation).

Oracle: torch (independent runtime) for the conv, numpy for the
quantization arithmetic.
"""

from __future__ import annotations

import numpy as np
import pytest

import tests.onnx_exporter_sim as sim
from ocr_inference_tpu.onnx.runner import OnnxGraphFunction
from ocr_inference_tpu.onnx.wire import fold_dequantize, load_model, parse_model


@pytest.fixture(scope="module")
def quantized_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("quant")
    rng = np.random.default_rng(11)
    w_q = rng.integers(-127, 128, size=(4, 3, 3, 3)).astype(np.int8)
    w_scale = rng.uniform(0.005, 0.02, size=(4,)).astype(np.float32)
    w_zp = rng.integers(-8, 8, size=(4,)).astype(np.int8)
    act_scale = np.float32(0.05)
    act_zp = np.uint8(128)

    inits = [
        sim.tensor("w_q", w_q),
        sim.tensor("w_scale", w_scale),
        sim.tensor("w_zp", w_zp),
        sim.tensor("act_scale", np.array(act_scale, np.float32)),
        sim.tensor("act_zp", np.array(act_zp, np.uint8)),
    ]
    nodes = [
        # per-channel (axis=0) weight dequantization — folds at load
        sim.node("DequantizeLinear", ["w_q", "w_scale", "w_zp"], ["w_f"],
                 axis=0),
        sim.node("Conv", ["input", "w_f"], ["c"], kernel_shape=[3, 3],
                 pads=[1, 1, 1, 1]),
        sim.node("Relu", ["c"], ["r"]),
        # QDQ activation pair — executes at runtime
        sim.node("QuantizeLinear", ["r", "act_scale", "act_zp"], ["q"]),
        sim.node("DequantizeLinear", ["q", "act_scale", "act_zp"],
                 ["output"]),
    ]
    inputs = [sim.value_info("input", (1, 3, 8, 8))]
    outputs = [sim.value_info("output", (1, 4, 8, 8))]
    path = d / "quant.onnx"
    path.write_bytes(sim.model(nodes, inits, inputs, outputs, opset=13))
    x = rng.uniform(-1, 1, size=(1, 3, 8, 8)).astype(np.float32)
    return path, (w_q, w_scale, w_zp, act_scale, act_zp), x


def _oracle(params, x):
    import torch
    import torch.nn.functional as F

    w_q, w_scale, w_zp, act_scale, act_zp = params
    w_f = (
        w_q.astype(np.float32) - w_zp.astype(np.float32)[:, None, None, None]
    ) * w_scale[:, None, None, None]
    r = F.relu(
        F.conv2d(torch.from_numpy(x), torch.from_numpy(w_f), padding=1)
    ).numpy()
    q = np.clip(
        np.round(r / act_scale) + np.float32(act_zp), 0, 255
    )  # np.round = half-to-even, like the op
    return (q - np.float32(act_zp)) * act_scale, w_f


def test_weight_dq_folds_at_load(quantized_model):
    path, params, _ = quantized_model
    m = load_model(path)
    ops = [n.op_type for n in m.graph.nodes]
    # the weight DQ is gone; the activation QDQ pair remains
    assert ops == ["Conv", "Relu", "QuantizeLinear", "DequantizeLinear"]
    _, w_f = _oracle(params, np.zeros((1, 3, 8, 8), np.float32))
    folded = m.graph.initializers["w_f"].to_numpy()
    assert folded.dtype == np.float32
    np.testing.assert_allclose(folded, w_f, rtol=0, atol=0)


def test_executor_matches_oracle(quantized_model):
    path, params, x = quantized_model
    fn = OnnxGraphFunction(load_model(path))
    (got,) = fn(fn.weights, x)
    want, _ = _oracle(params, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_runtime_dq_equals_folded(quantized_model):
    """Without the load-time fold, the runtime DequantizeLinear op must
    produce the same result (the executor path quantized activations take)."""
    path, params, x = quantized_model
    unfolded = parse_model(path.read_bytes())
    assert [n.op_type for n in unfolded.graph.nodes][0] == "DequantizeLinear"
    fn = OnnxGraphFunction(unfolded)
    (got,) = fn(fn.weights, x)
    want, _ = _oracle(params, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_fold_returns_count(quantized_model):
    path, _, _ = quantized_model
    m = parse_model(path.read_bytes())
    assert fold_dequantize(m.graph) == 1
    assert fold_dequantize(m.graph) == 0  # idempotent
