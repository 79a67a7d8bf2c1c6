"""A tf2onnx-dialect ONNX writer for the torch twin architectures.

The published BDRC Easter2-family checkpoints are Keras-lineage nets whose
``.onnx`` files most plausibly came through tf2onnx/keras2onnx
(reference: Config.py:18-30, run at BDRC/inference.py:128,294) — a dialect
with habits the TorchScript exporter never produces. This writer emits the
torch twins (models/torch_twins.py) in that dialect so the executor and
transplanter are validated against it offline (VERDICT r2 item 5):

- NHWC / NLC graph inputs with Transpose sandwiches around the NCHW body;
- BatchNorm decomposed into per-channel Mul + Add constants (keras2onnx
  folding) instead of BatchNormalization nodes;
- 1-D convolutions run as 2-D inside Unsqueeze/Conv/Squeeze chains
  (tf2onnx's Conv1D lowering);
- explicit Pad nodes (pads as int64 *inputs*, opset-13 style) for the
  asymmetric SAME paddings; symmetric 3x3 convs use auto_pad=SAME_UPPER;
- no Gemm — Linears become MatMul(+Add) with the kernel stored (in, out);
- Squeeze/Unsqueeze axes as int64 inputs (opset 13);
- SpaceToDepth for the UNet stem2 variant's lossless stem regrouping;
- tf-style tensor naming: ``StatefulPartitionedCall/model/.../ReadVariableOp:0``
  initializers, ``serving_default_input:0`` input, ``StatefulPartitionedCall:0``
  output, everything suffixed ``:0``;
- producer "tf2onnx", graph name "tf2onnx".

Serialization uses the independent exporter-style writer
(tests/onnx_exporter_sim.py), not the framework's own wire encoder.
"""

from __future__ import annotations

import itertools

import numpy as np

from tests import onnx_exporter_sim as sim

GRAPH_INPUT = "serving_default_input:0"
GRAPH_OUTPUT = "StatefulPartitionedCall:0"


def _np(t):
    return t.detach().numpy().astype(np.float32)


class TfBuilder:
    """Accumulates tf2onnx-style nodes/initializers and serializes them."""

    def __init__(self):
        self.nodes: list[bytes] = []
        self.inits: list[bytes] = []
        self._n = 0
        self._storage = itertools.cycle(["raw", "floats"])

    def _fresh(self, hint: str) -> str:
        self._n += 1
        return f"StatefulPartitionedCall/model/{hint}_{self._n}:0"

    def init(self, hint: str, arr: np.ndarray) -> str:
        arr = np.ascontiguousarray(arr)
        name = (
            f"StatefulPartitionedCall/model/{hint}_{len(self.inits)}"
            f"/ReadVariableOp:0"
        )
        storage = (
            next(self._storage) if arr.dtype == np.float32 else "raw"
        )
        self.inits.append(sim.tensor(name, arr, storage=storage))
        return name

    def node(self, op: str, inputs, hint: str | None = None,
             out_name: str | None = None, **attrs) -> str:
        out = out_name or self._fresh(hint or op.lower())
        self.nodes.append(
            sim.node(op, inputs, [out],
                     name=f"{hint or op}_{self._n}", **attrs)
        )
        return out

    def axes(self, values) -> str:
        return self.init("axes", np.asarray(values, np.int64))

    # -- composite emitters (one per tf2onnx lowering idiom) --------------

    def pad(self, x: str, begin, end) -> str:
        """Explicit Pad with opset-13 pads-as-input."""
        pads = np.asarray(list(begin) + list(end), np.int64)
        return self.node("Pad", [x, self.init("pad", pads)], hint="pad",
                         mode="constant")

    def conv1d(self, x: str, w_oik: np.ndarray, b: np.ndarray | None = None,
               stride: int = 1, dilation: int = 1,
               pads: tuple[int, int] = (0, 0), hint: str = "conv1d") -> str:
        """tf2onnx Conv1D lowering: Unsqueeze -> 2-D Conv -> Squeeze, with
        any padding as an explicit Pad on the 3-D tensor."""
        if pads != (0, 0):
            x = self.pad(x, (0, 0, pads[0]), (0, 0, pads[1]))
        x = self.node("Unsqueeze", [x, self.axes([2])], hint=f"{hint}/expand")
        ins = [x, self.init(f"{hint}/kernel", w_oik[:, :, None, :])]
        if b is not None:
            ins.append(self.init(f"{hint}/bias", b))
        x = self.node(
            "Conv", ins, hint=hint,
            strides=[1, stride], dilations=[1, dilation],
            kernel_shape=[1, w_oik.shape[2]],
        )
        return self.node("Squeeze", [x, self.axes([2])],
                         hint=f"{hint}/squeeze")

    def conv2d(self, x: str, w_oihw: np.ndarray,
               b: np.ndarray | None = None, stride: int = 1,
               same_upper: bool = False, hint: str = "conv2d") -> str:
        ins = [x, self.init(f"{hint}/kernel", w_oihw)]
        if b is not None:
            ins.append(self.init(f"{hint}/bias", b))
        attrs = dict(strides=[stride, stride],
                     kernel_shape=list(w_oihw.shape[2:]))
        if same_upper:
            attrs["auto_pad"] = "SAME_UPPER"
        return self.node("Conv", ins, hint=hint, **attrs)

    def bn_decomposed(self, x: str, bn, rank: int, hint: str = "bn") -> str:
        """keras2onnx BatchNorm folding: Mul + Add per-channel constants."""
        gamma, beta = _np(bn.weight), _np(bn.bias)
        mean, var = _np(bn.running_mean), _np(bn.running_var)
        s = gamma / np.sqrt(var + bn.eps)
        b = beta - mean * s
        shape = (1, s.size, 1, 1) if rank == 4 else (s.size, 1)
        x = self.node(
            "Mul", [x, self.init(f"{hint}/mul", s.reshape(shape))],
            hint=f"{hint}/mul",
        )
        return self.node(
            "Add", [x, self.init(f"{hint}/add", b.reshape(shape))],
            hint=f"{hint}/add",
        )

    def dense(self, x: str, linear, hint: str = "dense") -> str:
        """No Gemm: MatMul with the kernel stored (in, out), then Add."""
        w = _np(linear.weight).T  # (out,in) -> (in,out), tf storage order
        x = self.node("MatMul", [x, self.init(f"{hint}/kernel", w)],
                      hint=hint)
        if linear.bias is not None:
            x = self.node(
                "Add", [x, self.init(f"{hint}/bias", _np(linear.bias))],
                hint=f"{hint}/bias",
            )
        return x

    def resize2x(self, x: str, hint: str = "resize") -> str:
        scales = self.init("scales", np.asarray([1, 1, 2, 2], np.float32))
        return self.node(
            "Resize", [x, "", scales], hint=hint, mode="nearest",
            coordinate_transformation_mode="asymmetric",
            nearest_mode="floor",
        )

    def serialize(self, input_shape, output_shape, path) -> None:
        inputs = [sim.value_info(GRAPH_INPUT, input_shape)]
        outputs = [sim.value_info(GRAPH_OUTPUT, output_shape)]
        path.write_bytes(
            sim.model(
                self.nodes, self.inits, inputs, outputs, opset=13,
                producer="tf2onnx", producer_version="1.16.1",
                graph_name="tf2onnx",
            )
        )


def _conv_bn_1d(b: TfBuilder, x: str, m, hint: str) -> str:
    """tf-dialect emission of a TConvBN1D: Pad + wrapped Conv + Mul/Add."""
    x = b.conv1d(
        x, _np(m.conv.weight), stride=m.conv.stride[0],
        dilation=m.conv.dilation[0], pads=m.pads, hint=hint,
    )
    x = b.bn_decomposed(x, m.bn, rank=3, hint=f"{hint}/bn")
    return b.node("Relu", [x], hint=f"{hint}/relu") if m.act else x


def _easter_block(b: TfBuilder, x: str, blk, hint: str) -> str:
    r = b.conv1d(x, _np(blk.res_conv.weight), hint=f"{hint}/res")
    r = b.bn_decomposed(r, blk.res_bn, rank=3, hint=f"{hint}/res_bn")
    y = _conv_bn_1d(b, x, blk.c1, f"{hint}/c1")
    y = _conv_bn_1d(b, y, blk.c2, f"{hint}/c2")
    y = _conv_bn_1d(b, y, blk.c3, f"{hint}/c3")
    s = b.node("ReduceMean", [y], hint=f"{hint}/se/mean", axes=[2],
               keepdims=0)
    s = b.dense(s, blk.fc1, hint=f"{hint}/se/fc1")
    s = b.node("Relu", [s], hint=f"{hint}/se/relu")
    s = b.dense(s, blk.fc2, hint=f"{hint}/se/fc2")
    s = b.node("Sigmoid", [s], hint=f"{hint}/se/sigmoid")
    s = b.node("Unsqueeze", [s, b.axes([2])], hint=f"{hint}/se/expand")
    y = b.node("Mul", [y, s], hint=f"{hint}/se/scale")
    y = b.node("Add", [y, r], hint=f"{hint}/residual")
    return b.node("Relu", [y], hint=f"{hint}/relu")


def tf_export_easter2(tm, path) -> None:
    """TEaster2 in the tf2onnx dialect. Graph input is (B, W, H) — NLC,
    channels last — sandwiched around the channel-major body."""
    b = TfBuilder()
    x = b.node("Transpose", [GRAPH_INPUT], hint="to_nch", perm=[0, 2, 1])
    x = _conv_bn_1d(b, x, tm.stem1, "stem1")
    x = _conv_bn_1d(b, x, tm.stem2, "stem2")
    for i, blk in enumerate((tm.b1, tm.b2, tm.b3)):
        x = _easter_block(b, x, blk, f"block{i + 1}")
    x = _conv_bn_1d(b, x, tm.post1, "post1")
    x = _conv_bn_1d(b, x, tm.post2, "post2")
    x = b.conv1d(x, _np(tm.head.weight), _np(tm.head.bias), hint="head")
    b.node("Transpose", [x], hint="to_ntv", out_name=GRAPH_OUTPUT,
           perm=[0, 2, 1])
    b.serialize(("batch", "width", tm.stem1.conv.in_channels),
                ("batch", "time", tm.head.out_channels), path)


def _conv_bn_2d(b: TfBuilder, x: str, m, hint: str) -> str:
    """TConvBN2D (3x3 SAME stride 1) as auto_pad=SAME_UPPER Conv + Mul/Add."""
    x = b.conv2d(x, _np(m.conv.weight), same_upper=True, hint=hint)
    x = b.bn_decomposed(x, m.bn, rank=4, hint=f"{hint}/bn")
    return b.node("Relu", [x], hint=f"{hint}/relu")


def tf_export_unet(tu, path) -> None:
    """TUNet in the tf2onnx dialect: NHWC graph input, Transpose sandwich,
    SpaceToDepth stem when tu.stem_stride > 1."""
    b = TfBuilder()
    x = b.node("Transpose", [GRAPH_INPUT], hint="to_nchw", perm=[0, 3, 1, 2])
    stem = None
    if tu.stem_conv is not None:
        stem = _conv_bn_2d(b, x, tu.stem_conv, "stem")
        x = b.node("SpaceToDepth", [x], hint="space_to_depth",
                   blocksize=tu.stem_stride)
    skips = []
    for i, (c1, c2) in enumerate(tu.downs):
        x = _conv_bn_2d(b, x, c1, f"down{i}/c1")
        x = _conv_bn_2d(b, x, c2, f"down{i}/c2")
        skips.append(x)
        x = b.node("MaxPool", [x], hint=f"down{i}/pool",
                   kernel_shape=[2, 2], strides=[2, 2])
    x = _conv_bn_2d(b, x, tu.mid1, "mid1")
    x = _conv_bn_2d(b, x, tu.mid2, "mid2")
    for i, ((up_conv, c1, c2), skip) in enumerate(
        zip(tu.ups, reversed(skips))
    ):
        x = b.resize2x(x, hint=f"up{i}/resize")
        x = b.pad(x, (0, 0, 0, 0), (0, 0, 1, 1))  # F.pad (0,1,0,1)
        x = b.conv2d(x, _np(up_conv.weight), _np(up_conv.bias),
                     hint=f"up{i}/conv")
        x = b.node("Concat", [x, skip], hint=f"up{i}/concat", axis=1)
        x = _conv_bn_2d(b, x, c1, f"up{i}/c1")
        x = _conv_bn_2d(b, x, c2, f"up{i}/c2")
    if stem is not None:
        x = b.resize2x(x, hint="stem_up")
        x = b.node("Concat", [x, stem], hint="stem_concat", axis=1)
        x = _conv_bn_2d(b, x, tu.stem_out, "stem_out")
    x = b.conv2d(x, _np(tu.head.weight), _np(tu.head.bias), hint="head")
    b.node("Transpose", [x], hint="to_nhwc", out_name=GRAPH_OUTPUT,
           perm=[0, 2, 3, 1])
    in_ch = (
        tu.stem_conv.conv.in_channels
        if tu.stem_conv is not None
        else tu.downs[0][0].conv.in_channels
    )
    b.serialize(("batch", "h", "w", in_ch),
                ("batch", "h", "w", tu.head.out_channels), path)
