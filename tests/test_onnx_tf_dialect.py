"""tf2onnx-dialect validation of the executor and transplanter.

The published BDRC Easter2-family checkpoints are Keras-lineage nets most
plausibly exported through tf2onnx/keras2onnx (reference: Config.py:18-30,
sessions at BDRC/inference.py:128,294) — a dialect the TorchScript exporter
never produces: NHWC Transpose sandwiches, BatchNorm decomposed into
Mul/Add constants, explicit Pad nodes, Conv1D as Unsqueeze/Conv2D/Squeeze
chains, MatMul+Add instead of Gemm, SpaceToDepth, ``:0``-suffixed tf tensor
names. tests/tf_exporter_sim.py writes the torch twins in that dialect;
these tests prove the graphs execute and transplant to <=1e-3 of the torch
oracle (VERDICT r2 item 5 — the offline-attackable half of the
real-checkpoint risk)."""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tests import onnx_exporter_sim as sim
from tests.tf_exporter_sim import (
    GRAPH_INPUT,
    GRAPH_OUTPUT,
    tf_export_easter2,
    tf_export_unet,
)
from ocr_inference_tpu.models.torch_twins import TEaster2, TUNet
from ocr_inference_tpu.onnx.runner import OnnxGraphFunction
from ocr_inference_tpu.onnx.transplant import transplant, verify_transplant
from ocr_inference_tpu.onnx.wire import load_model


def _randomize_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# SpaceToDepth / DepthToSpace op semantics
# ---------------------------------------------------------------------------

def _single_node_model(tmp_path, op: str, **attrs):
    nodes = [sim.node(op, ["input"], ["output"], **attrs)]
    inputs = [sim.value_info("input", ("b", "c", "h", "w"))]
    outputs = [sim.value_info("output", ("b", "c", "h", "w"))]
    path = tmp_path / f"{op}.onnx"
    path.write_bytes(sim.model(nodes, [], inputs, outputs))
    return OnnxGraphFunction(load_model(path))


def test_space_to_depth_matches_onnx_spec(tmp_path):
    """ONNX channel order: out[(bi*k + bj)*C + c] — the same order as the
    flax stem regrouping (models/segmentation.py space_to_depth) and NOT
    torch pixel_unshuffle's c-major order."""
    fn = _single_node_model(tmp_path, "SpaceToDepth", blocksize=2)
    x = np.arange(2 * 3 * 4 * 6, dtype=np.float32).reshape(2, 3, 4, 6)
    (got,) = fn(fn.weights, x)
    want = (
        x.reshape(2, 3, 2, 2, 3, 2)
        .transpose(0, 3, 5, 1, 2, 4)
        .reshape(2, 12, 2, 3)
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # and it equals the flax regrouping modulo NCHW<->NHWC
    from ocr_inference_tpu.models.segmentation import space_to_depth

    flax_out = np.asarray(
        space_to_depth(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(np.asarray(got), flax_out)


def test_depth_to_space_inverts_and_matches_torch(tmp_path):
    x = np.random.default_rng(0).normal(size=(1, 8, 4, 6)).astype(np.float32)
    s2d = _single_node_model(tmp_path, "SpaceToDepth", blocksize=2)
    d2s_dcr = _single_node_model(tmp_path, "DepthToSpace", blocksize=2,
                                 mode="DCR")
    y = np.asarray(s2d(s2d.weights, np.asarray(
        d2s_dcr(d2s_dcr.weights, x)[0]))[0])
    np.testing.assert_allclose(y, x)  # S2D inverts DCR D2S
    # CRD mode is torch pixel_shuffle's order
    d2s_crd = _single_node_model(tmp_path, "DepthToSpace", blocksize=2,
                                 mode="CRD")
    got = np.asarray(d2s_crd(d2s_crd.weights, x)[0])
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(got, want)


# ---------------------------------------------------------------------------
# Easter2 in the tf dialect
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tf_easter2(tmp_path_factory):
    torch.manual_seed(0)
    H, W, V = 16, 64, 17
    tm = TEaster2(H, W, V).eval()
    _randomize_bn(tm)
    path = tmp_path_factory.mktemp("tf") / "easter2_tf.onnx"
    tf_export_easter2(tm, path)
    x = np.random.RandomState(0).randn(2, H, W).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 1)  # (B,T,V)
    return path, x, ref


def test_tf_easter2_parse(tf_easter2):
    path, _, _ = tf_easter2
    m = load_model(path)
    assert m.producer == "tf2onnx"
    assert all(n.op_type != "Gemm" for n in m.graph.nodes)
    assert all(n.op_type != "BatchNormalization" for n in m.graph.nodes)
    assert any(n.op_type == "Pad" for n in m.graph.nodes)
    assert all(name.endswith(":0") for name in m.graph.initializers)
    fn = OnnxGraphFunction(m)
    assert fn.input_names == [GRAPH_INPUT]
    assert fn.output_names == [GRAPH_OUTPUT]


def test_tf_easter2_executor_matches_torch(tf_easter2):
    path, x, ref = tf_easter2
    fn = OnnxGraphFunction(load_model(path))
    # graph input is (B, W, H) channels-last; output already (B, T, V)
    got = np.asarray(fn(fn.weights, jnp.asarray(x.transpose(0, 2, 1)))[0])
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-3


def test_tf_easter2_transplant(tf_easter2):
    from ocr_inference_tpu.models.recognition import Easter2

    path, x, ref = tf_easter2
    model = load_model(path)
    module = Easter2(vocab_size=17, dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    new_vars, report = transplant(model, module, variables, jnp.asarray(x))
    out = np.asarray(module.apply(new_vars, jnp.asarray(x)))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(
        model, module, new_vars, x, report,
        graph_input=x.transpose(0, 2, 1),
    )
    assert report.final_max_abs_diff < 1e-3
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs, "per-layer verification matched no layers"
    assert max(diffs) < 1e-2
    # the decomposed Mul/Add pairs were recognized as BatchNorms
    assert any(e.kind == "bn" for e in report.entries)


def test_tf_easter2_retroplant_writeback(tf_easter2, tmp_path):
    """Fresh flax variables written back into the tf-dialect file: the
    rewritten graph must compute the flax module's function (decomposed
    BN constants re-folded from the flax statistics)."""
    from ocr_inference_tpu.models.recognition import Easter2
    from ocr_inference_tpu.onnx.retroplant import write_back

    path, x, _ = tf_easter2
    module = Easter2(vocab_size=17, dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(7), jnp.asarray(x))
    want = np.asarray(module.apply(variables, jnp.asarray(x)))

    path2 = str(tmp_path / "easter2_tf_back.onnx")
    mapping = write_back(str(path), module, variables, jnp.asarray(x), path2)
    assert mapping
    fn = OnnxGraphFunction(load_model(path2))
    got = np.asarray(fn(fn.weights, jnp.asarray(x.transpose(0, 2, 1)))[0])
    assert np.max(np.abs(got - want)) < 1e-4


# ---------------------------------------------------------------------------
# UNet in the tf dialect (incl. the SpaceToDepth stem2 variant)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stem_stride", [1, 2])
def test_tf_unet_executor_and_transplant(tmp_path, stem_stride):
    from ocr_inference_tpu.models.segmentation import UNet

    torch.manual_seed(1 + stem_stride)
    tm = TUNet(width=8, stem_stride=stem_stride).eval()
    _randomize_bn(tm)
    path = tmp_path / f"unet_tf_{stem_stride}.onnx"
    tf_export_unet(tm, path)
    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)  # NHWC

    model = load_model(path)
    if stem_stride == 2:
        assert any(n.op_type == "SpaceToDepth" for n in model.graph.nodes)
    fn = OnnxGraphFunction(model)
    x_nhwc = x.transpose(0, 2, 3, 1)
    got = np.asarray(fn(fn.weights, jnp.asarray(x_nhwc))[0])
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-3

    module = UNet(classes=1, width=8, stem_stride=stem_stride,
                  dtype=jnp.float32)
    xj = jnp.asarray(x_nhwc)
    variables = module.init(jax.random.PRNGKey(0), xj)
    new_vars, report = transplant(model, module, variables, xj)
    out = np.asarray(module.apply(new_vars, xj))
    assert np.max(np.abs(out - ref)) < 1e-3

    report = verify_transplant(
        model, module, new_vars, xj, report, graph_input=x_nhwc
    )
    assert report.final_max_abs_diff < 1e-3
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs and max(diffs) < 1e-2
