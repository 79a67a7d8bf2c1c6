"""ONNX operator -> JAX lowering registry.

Covers the op set used by CNN/CTC inference graphs (conv nets with BN,
pooling, attention blocks, GRU/LSTM recurrences, shape plumbing). Each
lowering takes (node, inputs) where inputs are JAX arrays (or numpy arrays
for constant-folded values) laid out exactly as ONNX defines them (NCHW for
images), and returns a tuple of outputs.

Constant folding: the executor evaluates a node on host numpy whenever every
input is a host constant — that resolves the Shape/Gather/Concat/Reshape
shape-computation chains ONNX exporters emit, keeping the traced graph
static-shaped for XLA.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ocr_inference_tpu.onnx.wire import Node

REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = fn
        return fn

    return deco


def _pair(v, n=2):
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _auto_pad(node: Node, spatial_rank: int, kernel, strides, dilations):
    """Resolve pads from auto_pad/pads attributes -> ((lo, hi), ...)."""
    auto = node.attr("auto_pad", "NOTSET")
    pads = node.attr("pads")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        return auto  # handled by lax padding="SAME" on the flipped axes
    if pads is None:
        return tuple((0, 0) for _ in range(spatial_rank))
    half = len(pads) // 2
    return tuple((pads[i], pads[i + half]) for i in range(half))


# ---------------------------------------------------------------------------
# Elementwise / activation
# ---------------------------------------------------------------------------

for _name, _fn in {
    "Relu": lambda x: jnp.maximum(x, 0),
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Sqrt": jnp.sqrt,
    "Abs": jnp.abs,
    "Neg": lambda x: -x,
    "Floor": jnp.floor,
    "Ceil": jnp.ceil,
    "Round": jnp.round,
    "Erf": jax.scipy.special.erf,
    "Softplus": jax.nn.softplus,
    "Identity": lambda x: x,
    "Not": jnp.logical_not,
    "Sin": jnp.sin,
    "Cos": jnp.cos,
}.items():
    REGISTRY[_name] = (
        lambda node, inputs, f=_fn: (f(inputs[0]),)
    )


@register("LeakyRelu")
def _leaky_relu(node, inputs):
    alpha = node.attr("alpha", 0.01)
    x = inputs[0]
    return (jnp.where(x >= 0, x, alpha * x),)


@register("Elu")
def _elu(node, inputs):
    alpha = node.attr("alpha", 1.0)
    x = inputs[0]
    return (jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1)),)


@register("HardSigmoid")
def _hard_sigmoid(node, inputs):
    alpha = node.attr("alpha", 0.2)
    beta = node.attr("beta", 0.5)
    return (jnp.clip(alpha * inputs[0] + beta, 0, 1),)


@register("PRelu")
def _prelu(node, inputs):
    x, slope = inputs
    return (jnp.where(x >= 0, x, slope * x),)


@register("Clip")
def _clip(node, inputs):
    x = inputs[0]
    lo = inputs[1] if len(inputs) > 1 and inputs[1] is not None else node.attr("min")
    hi = inputs[2] if len(inputs) > 2 and inputs[2] is not None else node.attr("max")
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return (x,)


@register("Softmax")
def _softmax(node, inputs):
    axis = node.attr("axis", -1)
    return (jax.nn.softmax(inputs[0], axis=axis),)


@register("LogSoftmax")
def _log_softmax(node, inputs):
    axis = node.attr("axis", -1)
    return (jax.nn.log_softmax(inputs[0], axis=axis),)


# binary (with numpy-style broadcasting)
for _name, _fn in {
    "Add": jnp.add,
    "Sub": jnp.subtract,
    "Mul": jnp.multiply,
    "Div": jnp.divide,
    "Pow": jnp.power,
    "Min": jnp.minimum,
    "Max": jnp.maximum,
    "Equal": jnp.equal,
    "Greater": jnp.greater,
    "GreaterOrEqual": jnp.greater_equal,
    "Less": jnp.less,
    "LessOrEqual": jnp.less_equal,
    "And": jnp.logical_and,
    "Or": jnp.logical_or,
    "Mod": jnp.mod,
}.items():
    REGISTRY[_name] = (
        lambda node, inputs, f=_fn: (f(*inputs),)
    )


@register("Where")
def _where(node, inputs):
    return (jnp.where(inputs[0], inputs[1], inputs[2]),)


# ---------------------------------------------------------------------------
# Shape plumbing
# ---------------------------------------------------------------------------

@register("Shape")
def _shape(node, inputs):
    start = node.attr("start", 0)
    end = node.attr("end")
    shape = list(np.shape(inputs[0]))
    shape = shape[start:end] if end is not None else shape[start:]
    return (np.asarray(shape, dtype=np.int64),)


@register("Size")
def _size(node, inputs):
    return (np.asarray(np.size(inputs[0]), dtype=np.int64),)


@register("Reshape")
def _reshape(node, inputs):
    x, shape = inputs
    shape = [int(s) for s in np.asarray(shape)]
    # ONNX: 0 means "copy input dim"
    shape = [
        x.shape[i] if s == 0 and node.attr("allowzero", 0) == 0 else s
        for i, s in enumerate(shape)
    ]
    return (jnp.reshape(x, shape),)


@register("Transpose")
def _transpose(node, inputs):
    perm = node.attr("perm")
    x = inputs[0]
    if perm is None:
        perm = list(reversed(range(np.ndim(x))))
    return (jnp.transpose(x, perm),)


@register("Squeeze")
def _squeeze(node, inputs):
    x = inputs[0]
    axes = (
        [int(a) for a in np.asarray(inputs[1])]
        if len(inputs) > 1 and inputs[1] is not None
        else node.attr("axes")
    )
    if axes is None:
        axes = [i for i, d in enumerate(np.shape(x)) if d == 1]
    axes = [a % np.ndim(x) for a in axes]
    return (jnp.squeeze(x, axis=tuple(axes)),)


@register("Unsqueeze")
def _unsqueeze(node, inputs):
    x = inputs[0]
    axes = (
        [int(a) for a in np.asarray(inputs[1])]
        if len(inputs) > 1 and inputs[1] is not None
        else node.attr("axes")
    )
    out = x
    for a in sorted(a % (np.ndim(x) + len(axes)) for a in axes):
        out = jnp.expand_dims(out, a)
    return (out,)


@register("SpaceToDepth")
def _space_to_depth(node, inputs):
    """tf2onnx emits this for tf.nn.space_to_depth (and it is the on-wire
    form of the UNet stem2 variant's lossless stem regrouping). ONNX order:
    output channel index = (bi*k + bj)*C + c."""
    k = int(node.attr("blocksize"))
    x = inputs[0]
    n, c, h, w = x.shape
    x = jnp.reshape(x, (n, c, h // k, k, w // k, k))
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
    return (jnp.reshape(x, (n, c * k * k, h // k, w // k)),)


@register("DepthToSpace")
def _depth_to_space(node, inputs):
    k = int(node.attr("blocksize"))
    mode = node.attr("mode", "DCR")
    x = inputs[0]
    n, c, h, w = x.shape
    if mode == "DCR":
        x = jnp.reshape(x, (n, k, k, c // (k * k), h, w))
        x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))
    else:  # CRD (torch pixel_shuffle order)
        x = jnp.reshape(x, (n, c // (k * k), k, k, h, w))
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return (jnp.reshape(x, (n, c // (k * k), h * k, w * k)),)


@register("Flatten")
def _flatten(node, inputs):
    axis = node.attr("axis", 1)
    x = inputs[0]
    lead = int(np.prod(np.shape(x)[:axis])) if axis > 0 else 1
    return (jnp.reshape(x, (lead, -1)),)


@register("Concat")
def _concat(node, inputs):
    axis = node.attr("axis")
    if all(isinstance(i, np.ndarray) for i in inputs):
        return (np.concatenate(inputs, axis=axis),)
    return (jnp.concatenate(inputs, axis=axis),)


@register("Split")
def _split(node, inputs):
    x = inputs[0]
    axis = node.attr("axis", 0)
    splits = (
        [int(s) for s in np.asarray(inputs[1])]
        if len(inputs) > 1 and inputs[1] is not None
        else node.attr("split")
    )
    if splits is None:
        n_out = len(node.outputs)
        return tuple(jnp.split(x, n_out, axis=axis))
    indices = np.cumsum(splits)[:-1]
    return tuple(jnp.split(x, indices, axis=axis))


@register("Gather")
def _gather(node, inputs):
    x, idx = inputs
    axis = node.attr("axis", 0)
    if isinstance(x, np.ndarray) and isinstance(idx, (np.ndarray, int)):
        return (np.take(x, np.asarray(idx), axis=axis),)
    return (jnp.take(x, jnp.asarray(idx), axis=axis),)


@register("Slice")
def _slice(node, inputs):
    x = inputs[0]
    if len(inputs) > 1:
        starts = [int(v) for v in np.asarray(inputs[1])]
        ends = [int(v) for v in np.asarray(inputs[2])]
        axes = (
            [int(v) for v in np.asarray(inputs[3])]
            if len(inputs) > 3 and inputs[3] is not None
            else list(range(len(starts)))
        )
        steps = (
            [int(v) for v in np.asarray(inputs[4])]
            if len(inputs) > 4 and inputs[4] is not None
            else [1] * len(starts)
        )
    else:
        starts = node.attr("starts")
        ends = node.attr("ends")
        axes = node.attr("axes") or list(range(len(starts)))
        steps = [1] * len(starts)
    slices = [slice(None)] * np.ndim(x)
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        slices[ax] = slice(st, en, sp)
    return (x[tuple(slices)],)


@register("Expand")
def _expand(node, inputs):
    x, shape = inputs
    shape = [int(s) for s in np.asarray(shape)]
    target = list(np.broadcast_shapes(np.shape(x), tuple(shape)))
    return (jnp.broadcast_to(x, target),)


@register("Tile")
def _tile(node, inputs):
    x, reps = inputs
    return (jnp.tile(x, [int(r) for r in np.asarray(reps)]),)


@register("Cast")
def _cast(node, inputs):
    from ocr_inference_tpu.onnx.wire import TENSOR_DTYPES

    to = TENSOR_DTYPES[node.attr("to")]
    x = inputs[0]
    if isinstance(x, np.ndarray):
        return (x.astype(to),)
    return (x.astype(to),)


@register("Constant")
def _constant(node, inputs):
    for key in ("value", "value_float", "value_int", "value_floats",
                "value_ints"):
        v = node.attr(key)
        if v is not None:
            return (np.asarray(v),)
    raise ValueError(f"Constant node {node.name} has no value")


@register("ConstantOfShape")
def _constant_of_shape(node, inputs):
    shape = [int(s) for s in np.asarray(inputs[0])]
    value = node.attr("value")
    fill = value.ravel()[0] if value is not None else np.float32(0)
    return (np.full(shape, fill),)


@register("Range")
def _range(node, inputs):
    start, limit, delta = (np.asarray(v).item() for v in inputs)
    return (np.arange(start, limit, delta),)


@register("Pad")
def _pad(node, inputs):
    x = inputs[0]
    if len(inputs) > 1 and inputs[1] is not None:
        pads = [int(p) for p in np.asarray(inputs[1])]
        cval = (
            float(np.asarray(inputs[2]).item())
            if len(inputs) > 2 and inputs[2] is not None
            else 0.0
        )
    else:
        pads = node.attr("pads")
        cval = node.attr("value", 0.0)
    mode = node.attr("mode", "constant")
    rank = np.ndim(x)
    pad_width = [(pads[i], pads[i + rank]) for i in range(rank)]
    if mode == "constant":
        return (jnp.pad(x, pad_width, constant_values=cval),)
    jmode = {"reflect": "reflect", "edge": "edge"}[mode]
    return (jnp.pad(x, pad_width, mode=jmode),)


# ---------------------------------------------------------------------------
# Reductions / linear algebra
# ---------------------------------------------------------------------------

def _reduce(fn):
    def run(node, inputs):
        x = inputs[0]
        axes = node.attr("axes")
        if axes is None and len(inputs) > 1 and inputs[1] is not None:
            axes = [int(a) for a in np.asarray(inputs[1])]
        keepdims = bool(node.attr("keepdims", 1))
        axes = tuple(axes) if axes is not None else None
        return (fn(x, axis=axes, keepdims=keepdims),)

    return run


REGISTRY["ReduceMean"] = _reduce(jnp.mean)
REGISTRY["ReduceSum"] = _reduce(jnp.sum)
REGISTRY["ReduceMax"] = _reduce(jnp.max)
REGISTRY["ReduceMin"] = _reduce(jnp.min)
REGISTRY["ReduceProd"] = _reduce(jnp.prod)


@register("ArgMax")
def _argmax(node, inputs):
    axis = node.attr("axis", 0)
    keepdims = bool(node.attr("keepdims", 1))
    out = jnp.argmax(inputs[0], axis=axis)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return (out.astype(jnp.int64),)


@register("MatMul")
def _matmul(node, inputs):
    return (jnp.matmul(inputs[0], inputs[1]),)


@register("Gemm")
def _gemm(node, inputs):
    a, b = inputs[0], inputs[1]
    alpha = node.attr("alpha", 1.0)
    beta = node.attr("beta", 1.0)
    if node.attr("transA", 0):
        a = a.T
    if node.attr("transB", 0):
        b = b.T
    out = alpha * (a @ b)
    if len(inputs) > 2 and inputs[2] is not None:
        out = out + beta * inputs[2]
    return (out,)


@register("Einsum")
def _einsum(node, inputs):
    return (jnp.einsum(node.attr("equation"), *inputs),)


# ---------------------------------------------------------------------------
# Convolution / pooling / normalization (NCHW as ONNX defines)
# ---------------------------------------------------------------------------

@register("Conv")
def _conv(node, inputs):
    x, w = inputs[0], inputs[1]
    b = inputs[2] if len(inputs) > 2 else None
    spatial = np.ndim(x) - 2
    strides = _pair(node.attr("strides"), spatial)
    dilations = _pair(node.attr("dilations"), spatial)
    groups = node.attr("group", 1)
    kernel = w.shape[2:]
    pads = _auto_pad(node, spatial, kernel, strides, dilations)
    if pads == "SAME_UPPER":
        padding = "SAME"
    elif pads == "SAME_LOWER":
        padding = "SAME_LOWER"
    else:
        padding = pads
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH"),
    )
    out = lax.conv_general_dilated(
        x, w, strides, padding,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return (out,)


@register("ConvTranspose")
def _conv_transpose(node, inputs):
    x, w = inputs[0], inputs[1]
    b = inputs[2] if len(inputs) > 2 else None
    spatial = np.ndim(x) - 2
    strides = _pair(node.attr("strides"), spatial)
    dilations = _pair(node.attr("dilations"), spatial)
    groups = node.attr("group", 1)
    if groups != 1:
        raise NotImplementedError("grouped ConvTranspose")
    pads = node.attr("pads") or [0] * (2 * spatial)
    output_padding = _pair(node.attr("output_padding", 0), spatial)
    # ONNX ConvTranspose weight layout: (C_in, C_out/groups, *kernel)
    # lax.conv_transpose with transpose_kernel=True takes (I, O, *k) via
    # dimension numbers OIHW where O=C_in.
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "IOHW", "NCHW") if spatial == 2 else ("NCH", "IOH", "NCH"),
    )
    kernel = w.shape[2:]
    half = spatial
    pad_cfg = tuple(
        (
            dilations[i] * (kernel[i] - 1) - pads[i],
            dilations[i] * (kernel[i] - 1) - pads[i + half] + output_padding[i],
        )
        for i in range(spatial)
    )
    out = lax.conv_transpose(
        x, w, strides, pad_cfg,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        transpose_kernel=True,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return (out,)


def _pool(node, inputs, reducer, init, is_avg=False):
    x = inputs[0]
    spatial = np.ndim(x) - 2
    kernel = _pair(node.attr("kernel_shape"), spatial)
    strides = _pair(node.attr("strides"), spatial)
    pads = _auto_pad(node, spatial, kernel, strides, (1,) * spatial)
    ceil_mode = node.attr("ceil_mode", 0)
    if pads in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    else:
        padding = ((0, 0), (0, 0)) + tuple(pads)
    window = (1, 1) + kernel
    strd = (1, 1) + strides
    if ceil_mode and padding not in ("SAME",):
        # extend the high side so the last partial window is included
        shape = np.shape(x)
        padding = list(padding)
        for i in range(spatial):
            size = shape[2 + i] + padding[2 + i][0] + padding[2 + i][1]
            rem = (size - kernel[i]) % strides[i]
            if rem:
                padding[2 + i] = (
                    padding[2 + i][0],
                    padding[2 + i][1] + strides[i] - rem,
                )
        padding = tuple(padding)
    out = lax.reduce_window(x, init, reducer, window, strd, padding)
    if is_avg:
        ones = jnp.ones_like(x)
        counts = lax.reduce_window(ones, 0.0, lax.add, window, strd, padding)
        if node.attr("count_include_pad", 0):
            out = out / float(np.prod(kernel))
        else:
            out = out / counts
    return (out,)


@register("MaxPool")
def _max_pool(node, inputs):
    return _pool(node, inputs, lax.max, -jnp.inf)


@register("AveragePool")
def _avg_pool(node, inputs):
    return _pool(node, inputs, lax.add, 0.0, is_avg=True)


@register("GlobalAveragePool")
def _global_avg_pool(node, inputs):
    x = inputs[0]
    axes = tuple(range(2, np.ndim(x)))
    return (jnp.mean(x, axis=axes, keepdims=True),)


@register("GlobalMaxPool")
def _global_max_pool(node, inputs):
    x = inputs[0]
    axes = tuple(range(2, np.ndim(x)))
    return (jnp.max(x, axis=axes, keepdims=True),)


@register("BatchNormalization")
def _batch_norm(node, inputs):
    x, scale, bias, mean, var = inputs[:5]
    eps = node.attr("epsilon", 1e-5)
    spatial = np.ndim(x) - 2
    shape = (1, -1) + (1,) * spatial
    # fold to x*a + b with the statistics in f32 (stable even when the
    # graph executes reduced-precision), applied in the activation dtype so
    # a bf16 run stays bf16 end to end
    f32 = jnp.float32
    a = scale.astype(f32) / jnp.sqrt(var.astype(f32) + eps)
    b = bias.astype(f32) - mean.astype(f32) * a
    dt = jnp.asarray(x).dtype
    return (x * a.reshape(shape).astype(dt) + b.reshape(shape).astype(dt),)


@register("InstanceNormalization")
def _instance_norm(node, inputs):
    x, scale, bias = inputs
    eps = node.attr("epsilon", 1e-5)
    spatial_axes = tuple(range(2, np.ndim(x)))
    mean = jnp.mean(x, axis=spatial_axes, keepdims=True)
    var = jnp.var(x, axis=spatial_axes, keepdims=True)
    shape = (1, -1) + (1,) * (np.ndim(x) - 2)
    return ((x - mean) / jnp.sqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape),)


@register("LayerNormalization")
def _layer_norm(node, inputs):
    x, scale = inputs[0], inputs[1]
    bias = inputs[2] if len(inputs) > 2 else None
    axis = node.attr("axis", -1)
    eps = node.attr("epsilon", 1e-5)
    axes = tuple(range(axis % np.ndim(x), np.ndim(x)))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    out = (x - mean) / jnp.sqrt(var + eps) * scale
    if bias is not None:
        out = out + bias
    return (out,)


def _q_params(node, inputs, x_rank):
    """(scale, zero_point) broadcast to the quantization axis (default 1)
    when per-channel (1-D scale), per the QuantizeLinear/DequantizeLinear
    spec; scalars pass through."""
    scale = inputs[1]
    zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
    if np.ndim(scale) >= 1 and np.size(scale) > 1:
        axis = int(node.attr("axis", 1)) % x_rank
        shape = [1] * x_rank
        shape[axis] = -1
        scale = jnp.reshape(scale, shape)
        if zp is not None:
            zp = jnp.reshape(zp, shape)
    return scale, zp


@register("DequantizeLinear")
def _dequantize_linear(node, inputs):
    """y = (x - zero_point) * scale — the quantized-checkpoint dialect's
    weight storage (int8 initializers) and the DQ half of QDQ activation
    pairs. Constant-initializer instances are usually folded away at load
    (wire.fold_dequantize); this op covers the runtime (activation) case."""
    x = inputs[0]
    scale, zp = _q_params(node, inputs, max(np.ndim(x), 1))
    xf = jnp.asarray(x).astype(jnp.float32)
    if zp is not None:
        xf = xf - jnp.asarray(zp).astype(jnp.float32)
    return (xf * jnp.asarray(scale).astype(jnp.float32),)


@register("QuantizeLinear")
def _quantize_linear(node, inputs):
    """y = saturate(round(x / scale) + zero_point), round half-to-even,
    saturation range from the zero-point dtype (uint8 when absent)."""
    x = inputs[0]
    scale, zp = _q_params(node, inputs, max(np.ndim(x), 1))
    y = jnp.round(jnp.asarray(x) / jnp.asarray(scale).astype(jnp.float32))
    if zp is not None:
        out_dtype = np.dtype(np.asarray(zp).dtype if not hasattr(zp, "dtype")
                             else zp.dtype)
        y = y + jnp.asarray(zp).astype(jnp.float32)
    else:
        out_dtype = np.dtype(np.uint8)
    info = np.iinfo(out_dtype)
    y = jnp.clip(y, info.min, info.max)
    return (y.astype(out_dtype),)


@register("Dropout")
def _dropout(node, inputs):
    return (inputs[0],)


@register("Resize")
def _resize(node, inputs):
    x = inputs[0]
    mode = node.attr("mode", "nearest")
    sizes = None
    if len(inputs) > 3 and inputs[3] is not None:
        sizes = [int(s) for s in np.asarray(inputs[3])]
    elif len(inputs) > 2 and inputs[2] is not None and np.size(inputs[2]):
        scales = np.asarray(inputs[2], dtype=np.float64)
        sizes = [int(d * s) for d, s in zip(np.shape(x), scales)]
    if sizes is None:
        raise ValueError("Resize without sizes/scales")
    method = {"nearest": "nearest", "linear": "bilinear", "cubic": "bicubic"}[mode]
    return (jax.image.resize(x, sizes, method=method),)


@register("Upsample")
def _upsample(node, inputs):
    x = inputs[0]
    scales = (
        np.asarray(inputs[1], dtype=np.float64)
        if len(inputs) > 1
        else np.asarray(node.attr("scales"), dtype=np.float64)
    )
    sizes = [int(d * s) for d, s in zip(np.shape(x), scales)]
    mode = node.attr("mode", "nearest")
    method = {"nearest": "nearest", "linear": "bilinear"}[mode]
    return (jax.image.resize(x, sizes, method=method),)


# ---------------------------------------------------------------------------
# Recurrent (CRNN)
# ---------------------------------------------------------------------------

def _rnn_directions(node):
    direction = node.attr("direction", "forward")
    return 2 if direction == "bidirectional" else 1, direction


@register("LSTM")
def _lstm(node, inputs):
    x, w, r = inputs[0], inputs[1], inputs[2]
    b = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
    hidden = node.attr("hidden_size")
    num_dir, direction = _rnn_directions(node)
    seq_len, batch, _ = x.shape

    def run_dir(d):
        wd, rd = w[d], r[d]
        if b is not None:
            wb, rb = b[d][: 4 * hidden], b[d][4 * hidden :]
        else:
            wb = rb = jnp.zeros((4 * hidden,), x.dtype)
        xs = x if (d == 0 and direction != "reverse") else x[::-1]

        def step(carry, xt):
            h, c = carry
            gates = xt @ wd.T + wb + h @ rd.T + rb
            i, o, f, g = jnp.split(gates, 4, axis=-1)  # ONNX order: iofc
            i = jax.nn.sigmoid(i)
            o = jax.nn.sigmoid(o)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((batch, hidden), x.dtype)
        (hT, cT), hs = lax.scan(step, (h0, h0), xs)
        if d == 1 or direction == "reverse":
            hs = hs[::-1]
        return hs, hT, cT

    outs = [run_dir(d) for d in range(num_dir)]
    y = jnp.stack([o[0] for o in outs], axis=1)  # (T, D, B, H)
    y_h = jnp.stack([o[1] for o in outs], axis=0)
    y_c = jnp.stack([o[2] for o in outs], axis=0)
    return (y, y_h, y_c)


@register("GRU")
def _gru(node, inputs):
    x, w, r = inputs[0], inputs[1], inputs[2]
    b = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
    hidden = node.attr("hidden_size")
    linear_before_reset = node.attr("linear_before_reset", 0)
    num_dir, direction = _rnn_directions(node)
    seq_len, batch, _ = x.shape

    def run_dir(d):
        wd, rd = w[d], r[d]
        if b is not None:
            wb, rb = b[d][: 3 * hidden], b[d][3 * hidden :]
        else:
            wb = rb = jnp.zeros((3 * hidden,), x.dtype)
        xs = x if (d == 0 and direction != "reverse") else x[::-1]
        wz, wr_, wh = jnp.split(wd, 3, axis=0)
        rz, rr, rh = jnp.split(rd, 3, axis=0)
        wbz, wbr, wbh = jnp.split(wb, 3)
        rbz, rbr, rbh = jnp.split(rb, 3)

        def step(h, xt):
            z = jax.nn.sigmoid(xt @ wz.T + wbz + h @ rz.T + rbz)
            rg = jax.nn.sigmoid(xt @ wr_.T + wbr + h @ rr.T + rbr)
            if linear_before_reset:
                hh = jnp.tanh(xt @ wh.T + wbh + rg * (h @ rh.T + rbh))
            else:
                hh = jnp.tanh(xt @ wh.T + wbh + (rg * h) @ rh.T + rbh)
            h_new = (1 - z) * hh + z * h
            return h_new, h_new

        h0 = jnp.zeros((batch, hidden), x.dtype)
        hT, hs = lax.scan(step, h0, xs)
        if d == 1 or direction == "reverse":
            hs = hs[::-1]
        return hs, hT

    outs = [run_dir(d) for d in range(num_dir)]
    y = jnp.stack([o[0] for o in outs], axis=1)
    y_h = jnp.stack([o[1] for o in outs], axis=0)
    return (y, y_h)
