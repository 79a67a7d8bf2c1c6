"""An independent, exporter-style ONNX serializer for golden tests.

This writer deliberately shares NO code with ocr_inference_tpu.onnx.wire's
writer and mimics the habits of real exporters (torch.onnx / tf2onnx) that a
round-trip through the framework's own writer can never exercise:

- packed varint encoding for TensorProto.dims;
- float weights via packed float_data for some tensors, raw_data for others,
  and a sidecar external-data file for the largest one (data_location =
  EXTERNAL with location/offset/length entries);
- every initializer ALSO listed in graph.inputs (pre-IR4 exporter style);
- dynamic batch axes as dim_param strings;
- doc_string / producer_version / model_version / metadata_props fields the
  parser must skip;
- multiple opset imports (default domain + ai.onnx.ml);
- default-valued attributes omitted (e.g. Conv group, Gemm alpha).

Field numbers follow onnx/onnx.proto (ModelProto.graph = 7, opset_import = 8,
NodeProto.attribute = 5, ...).
"""

from __future__ import annotations

import struct

import numpy as np

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _uv(value: int) -> bytes:  # unsigned varint
    out = bytearray()
    value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fno: int, wtype: int) -> bytes:
    return _uv((fno << 3) | wtype)


def ln(fno: int, payload: bytes) -> bytes:
    return _tag(fno, _LEN) + _uv(len(payload)) + payload


def s(fno: int, text: str) -> bytes:
    return ln(fno, text.encode())


def vi(fno: int, value: int) -> bytes:
    return _tag(fno, _VARINT) + _uv(value)


def f32(fno: int, value: float) -> bytes:
    return _tag(fno, _I32) + struct.pack("<f", float(value))


def packed_varints(fno: int, values) -> bytes:
    return ln(fno, b"".join(_uv(int(v)) for v in values))


def string_entry(key: str, value: str) -> bytes:
    return s(1, key) + s(2, value)


def tensor(
    name: str,
    arr: np.ndarray,
    *,
    storage: str = "raw",
    external: dict | None = None,
) -> bytes:
    """TensorProto with exporter-style encodings. storage: raw | floats |
    external."""
    dtypes = {"float32": 1, "int64": 7, "int32": 6, "int8": 3, "uint8": 2}
    out = packed_varints(1, arr.shape)  # packed dims
    out += vi(2, dtypes[str(arr.dtype)])
    out += s(8, name)
    out += s(12, f"doc for {name}")  # doc_string — must be skipped
    if storage == "floats":
        payload = struct.pack(f"<{arr.size}f", *arr.ravel().tolist())
        out += ln(4, payload)  # packed float_data
    elif storage == "external":
        for k, v in external.items():
            out += ln(13, string_entry(k, str(v)))
        out += vi(14, 1)  # data_location = EXTERNAL
    else:
        out += ln(9, arr.tobytes())
    return out


def attr(name: str, value) -> bytes:
    out = s(1, name)
    out += s(13, "attr doc")  # doc_string — must be skipped
    if isinstance(value, float):
        out += f32(2, value) + vi(20, 1)
    elif isinstance(value, int):
        out += vi(3, value) + vi(20, 2)
    elif isinstance(value, str):
        out += ln(4, value.encode()) + vi(20, 3)
    elif isinstance(value, (list, tuple)):
        out += packed_varints(8, value) + vi(20, 7)  # packed ints
    else:
        raise TypeError(type(value))
    return out


def node(op: str, inputs, outputs, name: str = "", **attrs) -> bytes:
    out = b"".join(s(1, i) for i in inputs)
    out += b"".join(s(2, o) for o in outputs)
    out += s(3, name or f"{op}_node")
    out += s(4, op)
    out += b"".join(ln(5, attr(k, v)) for k, v in attrs.items())
    out += s(6, "node doc")  # doc_string
    out += s(7, "")  # empty default domain
    return out


def value_info(name: str, shape, elem_type: int = 1) -> bytes:
    dims = b""
    for d in shape:
        if isinstance(d, str):
            dims += ln(1, s(2, d))  # dim_param
        else:
            dims += ln(1, vi(1, int(d)))
    tensor_type = vi(1, elem_type) + ln(2, dims)
    return s(1, name) + ln(2, ln(1, tensor_type)) + s(3, "vi doc")


def model(
    nodes: list[bytes],
    initializers: list[bytes],
    inputs: list[bytes],
    outputs: list[bytes],
    opset: int = 13,
    producer: str = "pytorch",
    producer_version: str = "2.13",
    graph_name: str = "torch_jit",
) -> bytes:
    g = b"".join(ln(1, n) for n in nodes)
    g += s(2, graph_name)  # exporter-style graph name
    g += b"".join(ln(5, t) for t in initializers)
    g += s(10, "graph doc")  # GraphProto.doc_string
    g += b"".join(ln(11, i) for i in inputs)
    g += b"".join(ln(12, o) for o in outputs)
    m = vi(1, 7)  # ir_version 7
    m += s(2, producer)  # producer_name
    m += s(3, producer_version)  # producer_version
    m += s(4, "")  # domain
    m += vi(5, 1)  # model_version
    m += s(6, "model doc")  # doc_string
    m += ln(7, g)  # ModelProto.graph = 7
    m += ln(8, s(1, "") + vi(2, opset))  # default-domain opset
    m += ln(8, s(1, "ai.onnx.ml") + vi(2, 3))  # extra domain entry
    m += ln(14, string_entry("converted_by", "test"))  # metadata_props
    return m
