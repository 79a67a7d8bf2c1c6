"""Enable ``torch.onnx.export`` without the ``onnx`` package.

The published BDRC checkpoints are ``.onnx`` files produced by real
exporter toolchains (reference: BDRC/inference.py:128,294 loads them via
onnxruntime; PyTorch-LineInference.ipynb exports with torch.onnx). This
environment has torch but not the ``onnx`` python package, which torch's
TorchScript exporter imports only for (a) reloading the serialized proto to
splice in onnxscript custom functions and (b) optional checking — the proto
itself is serialized by torch's C++ exporter.

This module installs a minimal ``onnx`` stand-in backed by the framework's
own wire codec (ocr_inference_tpu.onnx.wire): ``load_model_from_string``
parses the real proto bytes so torch's custom-function scan sees the true
node domains, and ``SerializeToString`` returns the original bytes
unchanged (the scan adds functions only for custom domains, which the
framework never emits).

With the shim active, ``torch.onnx.export(..., dynamo=False)`` produces
byte-real exporter output — the same toolchain idioms (BN folding into
Conv, Gemm with transB, value-info naming) the published checkpoints carry
— which the executor (onnx/runner.py) and the weight transplanter
(onnx/transplant.py) are validated against in tests/test_transplant.py.
"""

from __future__ import annotations

import sys
import types

from ocr_inference_tpu.onnx import wire


class _NodeView:
    """NodeProto-shaped view over a wire.Node for torch's function scan."""

    def __init__(self, node: wire.Node):
        self.domain = node.domain
        self.op_type = node.op_type
        self.attribute = [
            types.SimpleNamespace(
                g=_GraphView(a.g) if a.g is not None else None
            )
            for a in node.attributes.values()
        ]


class _GraphView:
    def __init__(self, graph: wire.Graph):
        self.node = [_NodeView(n) for n in graph.nodes]


class _ModelProtoView:
    """Parsed, read-only ModelProto view; serializes to the original bytes."""

    def __init__(self, data: bytes):
        self._data = data
        self.graph = _GraphView(wire.parse_model(data).graph)
        self.functions = _Functions()

    def SerializeToString(self) -> bytes:
        return self._data


class _Functions(list):
    def extend(self, items):  # torch only extends when custom ops exist
        if items:
            raise NotImplementedError(
                "onnx export shim: onnxscript custom functions are not "
                "supported (install the real onnx package for those graphs)"
            )


def install() -> bool:
    """Install the shim as ``sys.modules['onnx']`` if onnx is absent.

    Returns True when the shim (or the real package) makes
    ``torch.onnx.export`` usable."""
    try:
        import onnx  # noqa: F401  (real package present: nothing to do)

        return True
    except ImportError:
        pass
    mod = types.ModuleType("onnx")
    mod.load_model_from_string = _ModelProtoView
    mod.load_from_string = _ModelProtoView
    mod.__ocr_inference_tpu_shim__ = True
    sys.modules["onnx"] = mod
    return True


def torch_export(module, example_input, path: str, opset_version: int = 17,
                 **kwargs) -> str:
    """Export a torch module through the REAL TorchScript exporter.

    Installs the shim, forces the legacy (non-dynamo) path — the one the
    published BDRC checkpoints were produced with — and returns ``path``."""
    install()
    import torch

    module = module.eval()
    with torch.no_grad():
        torch.onnx.export(
            module, example_input, path,
            opset_version=opset_version, dynamo=False, **kwargs,
        )
    return path
