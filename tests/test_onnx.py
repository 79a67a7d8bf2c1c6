"""ONNX parser + executor tests.

ONNX files are fabricated with the framework's own wire-format writer, then
parsed back and executed through JAX; outputs are compared against direct
numpy/jax computations. This exercises exactly the path real BDRC .onnx
models take (no onnx/onnxruntime packages exist in this environment).
"""

import numpy as np
import pytest

from ocr_inference_tpu.onnx import (
    OnnxGraphFunction,
    encode_model,
    encode_node,
    encode_tensor,
    encode_value_info,
    load_onnx_module,
    parse_model,
)

FLOAT = 1
INT64 = 7


def _build_model(nodes, initializers, inputs, outputs):
    return encode_model(
        nodes=nodes,
        initializers=initializers,
        inputs=inputs,
        outputs=outputs,
    )


def _run(model_bytes, *feeds, output_names=None):
    model = parse_model(model_bytes)
    fn = OnnxGraphFunction(model, output_names=output_names)
    outs = fn(fn.weights, *feeds)
    return [np.asarray(o) for o in outs]


def test_parse_roundtrip_metadata():
    buf = _build_model(
        nodes=[encode_node("Relu", ["x"], ["y"])],
        initializers=[],
        inputs=[encode_value_info("x", FLOAT, [1, 4])],
        outputs=[encode_value_info("y", FLOAT, [1, 4])],
    )
    model = parse_model(buf)
    assert model.producer == "ocr_inference_tpu"
    assert model.opset == 17
    assert model.graph.nodes[0].op_type == "Relu"
    assert model.graph.inputs[0].shape == [1, 4]


def test_elementwise_and_binary():
    buf = _build_model(
        nodes=[
            encode_node("Relu", ["x"], ["r"]),
            encode_node("Add", ["r", "b"], ["y"]),
        ],
        initializers=[encode_tensor("b", np.array([1.0, 2.0], np.float32))],
        inputs=[encode_value_info("x", FLOAT, [2, 2])],
        outputs=[encode_value_info("y", FLOAT, [2, 2])],
    )
    x = np.array([[-1.0, 3.0], [0.5, -2.0]], np.float32)
    (y,) = _run(buf, x)
    np.testing.assert_allclose(y, np.maximum(x, 0) + [1.0, 2.0])


def test_conv_bn_relu_matches_reference_math():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    bias = rng.normal(size=(4,)).astype(np.float32)
    scale = rng.normal(size=(4,)).astype(np.float32) + 1.0
    bn_bias = rng.normal(size=(4,)).astype(np.float32)
    mean = rng.normal(size=(4,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(4,)).astype(np.float32)

    buf = _build_model(
        nodes=[
            encode_node(
                "Conv", ["x", "w", "bias"], ["c"],
                kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1],
            ),
            encode_node(
                "BatchNormalization",
                ["c", "scale", "bn_bias", "mean", "var"],
                ["bn"],
                epsilon=1e-5,
            ),
            encode_node("Relu", ["bn"], ["y"]),
        ],
        initializers=[
            encode_tensor("w", w),
            encode_tensor("bias", bias),
            encode_tensor("scale", scale),
            encode_tensor("bn_bias", bn_bias),
            encode_tensor("mean", mean),
            encode_tensor("var", var),
        ],
        inputs=[encode_value_info("x", FLOAT, [1, 3, 8, 8])],
        outputs=[encode_value_info("y", FLOAT, [1, 4, 8, 8])],
    )
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    (y,) = _run(buf, x)

    # reference computation with scipy-free numpy conv
    from jax import lax
    import jax.numpy as jnp

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    conv = np.asarray(
        lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=dn)
    ) + bias.reshape(1, -1, 1, 1)
    bn = (conv - mean.reshape(1, -1, 1, 1)) / np.sqrt(
        var.reshape(1, -1, 1, 1) + 1e-5
    ) * scale.reshape(1, -1, 1, 1) + bn_bias.reshape(1, -1, 1, 1)
    ref = np.maximum(bn, 0)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-5)


def test_maxpool_and_gap():
    buf = _build_model(
        nodes=[
            encode_node("MaxPool", ["x"], ["p"], kernel_shape=[2, 2],
                        strides=[2, 2]),
            encode_node("GlobalAveragePool", ["p"], ["y"]),
        ],
        initializers=[],
        inputs=[encode_value_info("x", FLOAT, [1, 2, 4, 4])],
        outputs=[encode_value_info("y", FLOAT, [1, 2, 1, 1])],
    )
    x = np.arange(32, dtype=np.float32).reshape(1, 2, 4, 4)
    (y,) = _run(buf, x)
    pooled = x.reshape(1, 2, 2, 2, 2, 2).max(axis=(3, 5))
    np.testing.assert_allclose(y, pooled.mean(axis=(2, 3), keepdims=True))


def test_gemm_and_softmax():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(5, 3)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    buf = _build_model(
        nodes=[
            encode_node("Gemm", ["x", "w", "b"], ["g"], transB=0),
            encode_node("Softmax", ["g"], ["y"], axis=-1),
        ],
        initializers=[encode_tensor("w", w), encode_tensor("b", b)],
        inputs=[encode_value_info("x", FLOAT, [2, 5])],
        outputs=[encode_value_info("y", FLOAT, [2, 3])],
    )
    x = rng.normal(size=(2, 5)).astype(np.float32)
    (y,) = _run(buf, x)
    logits = x @ w + b
    e = np.exp(logits - logits.max(-1, keepdims=True))
    np.testing.assert_allclose(y, e / e.sum(-1, keepdims=True), rtol=1e-5)


def test_shape_chain_constant_folding():
    """Shape -> Gather -> Unsqueeze -> Concat -> Reshape, as exporters emit."""
    buf = _build_model(
        nodes=[
            encode_node("Shape", ["x"], ["shp"]),
            encode_node("Gather", ["shp", "zero"], ["b"], axis=0),
            encode_node("Unsqueeze", ["b", "axes0"], ["b1"]),
            encode_node("Concat", ["b1", "minus1"], ["newshape"], axis=0),
            encode_node("Reshape", ["x", "newshape"], ["y"]),
        ],
        initializers=[
            encode_tensor("zero", np.array(0, np.int64)),
            encode_tensor("axes0", np.array([0], np.int64)),
            encode_tensor("minus1", np.array([-1], np.int64)),
        ],
        inputs=[encode_value_info("x", FLOAT, [2, 3, 4])],
        outputs=[encode_value_info("y", FLOAT, [2, 12])],
    )
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    (y,) = _run(buf, x)
    np.testing.assert_allclose(y, x.reshape(2, 12))


def test_transpose_slice_concat():
    buf = _build_model(
        nodes=[
            encode_node("Transpose", ["x"], ["t"], perm=[0, 2, 1]),
            encode_node("Slice", ["t", "starts", "ends", "axes"], ["s"]),
            encode_node("Concat", ["s", "s"], ["y"], axis=2),
        ],
        initializers=[
            encode_tensor("starts", np.array([0], np.int64)),
            encode_tensor("ends", np.array([2], np.int64)),
            encode_tensor("axes", np.array([1], np.int64)),
        ],
        inputs=[encode_value_info("x", FLOAT, [1, 3, 4])],
        outputs=[encode_value_info("y", FLOAT, [1, 2, 6])],
    )
    x = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    (y,) = _run(buf, x)
    ref = np.transpose(x, (0, 2, 1))[:, 0:2, :]
    np.testing.assert_allclose(y, np.concatenate([ref, ref], axis=2))


def test_gru_bidirectional_shapes_and_determinism():
    rng = np.random.default_rng(2)
    hidden, input_size, t_len, batch = 4, 3, 6, 2
    w = rng.normal(size=(2, 3 * hidden, input_size)).astype(np.float32)
    r = rng.normal(size=(2, 3 * hidden, hidden)).astype(np.float32)
    b = rng.normal(size=(2, 6 * hidden)).astype(np.float32)
    buf = _build_model(
        nodes=[
            encode_node(
                "GRU", ["x", "w", "r", "b"], ["y", "y_h"],
                hidden_size=hidden, direction="bidirectional",
            )
        ],
        initializers=[
            encode_tensor("w", w),
            encode_tensor("r", r),
            encode_tensor("b", b),
        ],
        inputs=[encode_value_info("x", FLOAT, [t_len, batch, input_size])],
        outputs=[
            encode_value_info("y", FLOAT, [t_len, 2, batch, hidden]),
            encode_value_info("y_h", FLOAT, [2, batch, hidden]),
        ],
    )
    x = rng.normal(size=(t_len, batch, input_size)).astype(np.float32)
    y, y_h = _run(buf, x, output_names=["y", "y_h"])
    assert y.shape == (t_len, 2, batch, hidden)
    assert y_h.shape == (2, batch, hidden)
    # forward-direction last output equals y_h[0]
    np.testing.assert_allclose(y[-1, 0], y_h[0], rtol=1e-5)
    # backward-direction hidden corresponds to t=0 output
    np.testing.assert_allclose(y[0, 1], y_h[1], rtol=1e-5)


def test_lstm_forward_matches_manual():
    rng = np.random.default_rng(3)
    hidden, input_size, t_len = 3, 2, 4
    w = rng.normal(size=(1, 4 * hidden, input_size)).astype(np.float32)
    r = rng.normal(size=(1, 4 * hidden, hidden)).astype(np.float32)
    buf = _build_model(
        nodes=[
            encode_node("LSTM", ["x", "w", "r"], ["y", "y_h", "y_c"],
                        hidden_size=hidden)
        ],
        initializers=[encode_tensor("w", w), encode_tensor("r", r)],
        inputs=[encode_value_info("x", FLOAT, [t_len, 1, input_size])],
        outputs=[encode_value_info("y", FLOAT, [t_len, 1, 1, hidden])],
    )
    x = rng.normal(size=(t_len, 1, input_size)).astype(np.float32)
    (y,) = _run(buf, x, output_names=["y"])

    def sigmoid(v):
        return 1 / (1 + np.exp(-v))

    h = np.zeros((1, hidden), np.float32)
    c = np.zeros((1, hidden), np.float32)
    ref = []
    for t in range(t_len):
        gates = x[t] @ w[0].T + h @ r[0].T
        i, o, f, g = np.split(gates, 4, axis=-1)
        c = sigmoid(f) * c + sigmoid(i) * np.tanh(g)
        h = sigmoid(o) * np.tanh(c)
        ref.append(h.copy())
    np.testing.assert_allclose(y[:, 0], np.stack(ref), rtol=1e-4, atol=1e-5)


def test_unsupported_op_reports_clearly():
    buf = _build_model(
        nodes=[encode_node("TotallyMadeUpOp", ["x"], ["y"])],
        initializers=[],
        inputs=[encode_value_info("x", FLOAT, [1])],
        outputs=[encode_value_info("y", FLOAT, [1])],
    )
    model = parse_model(buf)
    with pytest.raises(NotImplementedError, match="TotallyMadeUpOp"):
        OnnxGraphFunction(model)


def test_onnx_module_segmentation_layout(tmp_path):
    """An NCHW conv graph runs through the engine-facing OnnxModule."""
    rng = np.random.default_rng(4)
    w = rng.normal(size=(1, 3, 3, 3)).astype(np.float32) * 0.1
    buf = _build_model(
        nodes=[
            encode_node("Conv", ["input", "w"], ["output"],
                        kernel_shape=[3, 3], pads=[1, 1, 1, 1]),
        ],
        initializers=[encode_tensor("w", w)],
        inputs=[encode_value_info("input", FLOAT, ["batch", 3, 64, 64])],
        outputs=[encode_value_info("output", FLOAT, ["batch", 1, 64, 64])],
    )
    path = tmp_path / "seg.onnx"
    path.write_bytes(buf)
    module = load_onnx_module(path, layout="nhwc->nchw")
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    out = np.asarray(module.apply(module.variables, x))
    assert out.shape == (2, 64, 64, 1)


def test_onnx_module_recognizer_layout(tmp_path):
    """A (B,1,H,W) -> (B,V,T) recognizer-style graph through OnnxModule with
    swap_hw=False, squeeze_channel=False, incl. the transpose-to-(T,V)."""
    rng = np.random.default_rng(5)
    vocab, h, w_dim = 6, 8, 32
    w = rng.normal(size=(vocab, 1, h, 5)).astype(np.float32) * 0.1
    buf = _build_model(
        nodes=[
            # conv collapses height -> (B, V, 1, T); squeeze -> (B, V, T)
            encode_node("Conv", ["input", "w"], ["c"],
                        kernel_shape=[h, 5], pads=[0, 2, 0, 2]),
            encode_node("Squeeze", ["c", "axes2"], ["output"]),
        ],
        initializers=[
            encode_tensor("w", w),
            encode_tensor("axes2", np.array([2], np.int64)),
        ],
        inputs=[encode_value_info("input", FLOAT, ["batch", 1, h, w_dim])],
        outputs=[encode_value_info("output", FLOAT, ["batch", vocab, w_dim])],
    )
    path = tmp_path / "rec.onnx"
    path.write_bytes(buf)
    module = load_onnx_module(
        path, layout="line", squeeze_channel=False, vocab_size=vocab
    )
    x = rng.normal(size=(3, h, w_dim)).astype(np.float32)
    logits = np.asarray(module.apply(module.variables, x))
    assert logits.shape == (3, w_dim, vocab)  # (B, T, V) for the decoder


def test_builder_uses_onnx_executor(tmp_path):
    """An OCR model dir whose model_file is a real .onnx builds a working
    RecognitionEngine via the ONNX executor path."""
    import jax.numpy as jnp

    from ocr_inference_tpu.core.data import CharsetEncoder, OCRModelConfig
    from ocr_inference_tpu.pipeline.builder import build_recognition_engine

    rng = np.random.default_rng(6)
    vocab, h = 5, 80
    w = rng.normal(size=(vocab, 1, h, 5)).astype(np.float32) * 0.05
    buf = _build_model(
        nodes=[
            encode_node("Conv", ["input", "w"], ["c"],
                        kernel_shape=[h, 5], pads=[0, 2, 0, 2],
                        strides=[1, 4]),
            encode_node("Squeeze", ["c", "axes2"], ["output"]),
        ],
        initializers=[
            encode_tensor("w", w),
            encode_tensor("axes2", np.array([2], np.int64)),
        ],
        inputs=[encode_value_info("input", FLOAT, ["batch", 1, h, "width"])],
        outputs=[encode_value_info("output", FLOAT, ["batch", vocab, "t"])],
    )
    onnx_path = tmp_path / "model.onnx"
    onnx_path.write_bytes(buf)

    config = OCRModelConfig(
        model_file=str(onnx_path),
        architecture="Easter2",
        input_width=512,
        input_height=h,
        input_layer="input",
        output_layer="output",
        squeeze_channel=False,
        swap_hw=False,
        encoder=CharsetEncoder.WYLIE,
        charset=list("abcd"),
        add_blank=True,
        version="1",
    )
    engine = build_recognition_engine(config)
    line = rng.integers(0, 255, size=(40, 300, 3), dtype=np.uint8)
    texts = engine.run_batch([line])
    assert len(texts) == 1 and isinstance(texts[0], str)
