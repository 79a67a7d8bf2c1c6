"""fp16-checkpoint dialect family + multi-file external data.

Closes the last two closeable PARITY.md residual rows (VERDICT r4 item 8):

- fp16 checkpoints end to end: the reference's model-config surface
  (reference: BDRC/utils.py:349-393) does not forbid fp16 .onnx files, and
  fp16-converted checkpoints are common exporter output. The family here is
  the REAL TorchScript exporter run on a ``.half()`` model (export_shim),
  validated through the full chain: wire parse -> executor vs the torch
  fp16 oracle -> transplant into the f32 Flax twin -> retroplant
  write-back. Tolerances are fp16-scale (~1e-2), not the f32 families'
  1e-3.
- multi-file external data: the single-sidecar offset mechanism is covered
  by tests/test_onnx_golden.py; real >2GB exports may split tensors across
  SEVERAL sidecar files. The fixture here stores two weights in two
  different files (each at a nonzero offset) and checks numerics against
  torch.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tests import onnx_exporter_sim as sim
from ocr_inference_tpu.models.torch_twins import TEaster2
from ocr_inference_tpu.onnx.export_shim import torch_export
from ocr_inference_tpu.onnx.runner import OnnxGraphFunction
from ocr_inference_tpu.onnx.transplant import transplant, verify_transplant
from ocr_inference_tpu.onnx.wire import load_model


# ---------------------------------------------------------------------------
# fp16 family (real exporter on a .half() model)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fp16_easter2(tmp_path_factory):
    torch.manual_seed(3)
    H, W, V = 16, 64, 17
    tm = TEaster2(H, W, V).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tm = tm.half()
    path = str(tmp_path_factory.mktemp("fp16") / "easter2_fp16.onnx")
    # constant folding off: BN statistics keep initializer slots, which the
    # write-back test needs (the same constraint the f32 families document)
    torch_export(tm, torch.randn(2, H, W).half(), path,
                 do_constant_folding=False)
    x16 = (np.random.RandomState(0).randn(2, H, W) * 0.5).astype(np.float16)
    with torch.no_grad():
        ref = (
            tm(torch.from_numpy(x16))
            .float()
            .numpy()
            .transpose(0, 2, 1)  # (B, T, V)
        )
    return path, x16, ref


def test_fp16_parse_keeps_half_weights(fp16_easter2):
    path, _, _ = fp16_easter2
    m = load_model(path)
    dtypes = {
        t.to_numpy().dtype for t in m.graph.initializers.values()
        if t.to_numpy().dtype.kind == "f"
    }
    assert np.dtype(np.float16) in dtypes, dtypes


def test_fp16_executor_matches_torch(fp16_easter2):
    path, x16, ref = fp16_easter2
    fn = OnnxGraphFunction(load_model(path))
    got = np.asarray(
        fn(fn.weights, jnp.asarray(x16))[0], dtype=np.float32
    ).transpose(0, 2, 1)
    assert got.shape == ref.shape
    # fp16 end to end on two independent runtimes: fp16-scale tolerance
    assert np.max(np.abs(got - ref)) < 3e-2, np.max(np.abs(got - ref))


def test_fp16_transplant_into_f32_flax(fp16_easter2):
    from ocr_inference_tpu.models.recognition import Easter2

    path, x16, ref = fp16_easter2
    model = load_model(path)
    x32 = x16.astype(np.float32)
    module = Easter2(vocab_size=17, dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x32))
    new_vars, report = transplant(model, module, variables, jnp.asarray(x32))
    out = np.asarray(module.apply(new_vars, jnp.asarray(x32)))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 3e-2

    # the graph side still computes in fp16, so it gets the fp16 input
    report = verify_transplant(
        model, module, new_vars, x32, report, graph_input=x16
    )
    assert report.final_max_abs_diff < 3e-2
    diffs = [e.max_abs_diff for e in report.entries
             if e.max_abs_diff is not None]
    assert diffs, "per-layer verification matched no layers"


def test_fp16_retroplant_writeback(fp16_easter2, tmp_path):
    """Fresh f32 Flax weights written back into the fp16 graph: the
    rewritten checkpoint computes the Flax function at fp16 tolerance."""
    from ocr_inference_tpu.models.recognition import Easter2
    from ocr_inference_tpu.onnx.retroplant import write_back

    path, x16, _ = fp16_easter2
    x32 = x16.astype(np.float32)
    module = Easter2(vocab_size=17, dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(7), jnp.asarray(x32))
    want = np.asarray(module.apply(variables, jnp.asarray(x32)))

    path2 = str(tmp_path / "easter2_fp16_back.onnx")
    mapping = write_back(path, module, variables, jnp.asarray(x32), path2)
    assert mapping
    fn = OnnxGraphFunction(load_model(path2))
    got = np.asarray(
        fn(fn.weights, jnp.asarray(x16))[0], dtype=np.float32
    ).transpose(0, 2, 1)
    assert np.max(np.abs(got - want)) < 3e-2


# ---------------------------------------------------------------------------
# multi-file external data
# ---------------------------------------------------------------------------

def test_multi_file_external_data(tmp_path):
    """Two initializers stored in TWO different sidecar files, each at a
    nonzero offset (the >2GB multi-file exporter layout): both resolve and
    the graph matches torch."""
    torch.manual_seed(11)
    conv = tnn.Conv2d(3, 6, 3, padding=1).eval()
    w = conv.weight.detach().numpy().astype(np.float32)
    b = conv.bias.detach().numpy().astype(np.float32)

    (tmp_path / "weights_0.bin").write_bytes(b"\x00" * 32 + w.tobytes())
    (tmp_path / "weights_1.bin").write_bytes(
        b"\xaa" * 8 + b.tobytes() + b"\xbb" * 4
    )

    inits = [
        sim.tensor("w", w, storage="external", external={
            "location": "weights_0.bin", "offset": 32, "length": w.nbytes,
        }),
        sim.tensor("b", b, storage="external", external={
            "location": "weights_1.bin", "offset": 8, "length": b.nbytes,
        }),
    ]
    nodes = [
        sim.node("Conv", ["input", "w", "b"], ["output"],
                 pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
    ]
    inputs = [sim.value_info("input", ("batch", 3, 16, 16))]
    outputs = [sim.value_info("output", ("batch", 6, 16, 16))]
    path = tmp_path / "multi_external.onnx"
    path.write_bytes(sim.model(nodes, inits, inputs, outputs, opset=13))

    m = load_model(path)
    assert np.array_equal(m.graph.initializers["w"].to_numpy(), w)
    assert np.array_equal(m.graph.initializers["b"].to_numpy(), b)

    x = np.random.RandomState(2).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    fn = OnnxGraphFunction(m)
    got = np.asarray(fn(fn.weights, jnp.asarray(x))[0])
    assert np.max(np.abs(got - ref)) < 1e-5
