"""ONNX graph executor: topological evaluation through JAX, jit-compiled.

Together with ``wire`` (parser) and ``ops`` (lowerings) this replaces the
reference's onnxruntime sessions (reference: BDRC/inference.py:128, 294):
an ``.onnx`` file from the BDRC HuggingFace repos loads directly and runs as
a jitted XLA program on TPU.

Two-phase execution model:
- constant phase (host numpy): initializers and any node whose inputs are
  all constants evaluate eagerly at load time — this folds away the
  Shape/Gather/Concat shape-computation chains exporters emit, so the traced
  program XLA sees is static-shaped;
- traced phase (JAX): everything reachable from graph inputs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ocr_inference_tpu.onnx import ops as onnx_ops
from ocr_inference_tpu.onnx.wire import Graph, Model, load_model


class OnnxGraphFunction:
    """A callable (weights, *inputs) -> outputs compiled from an ONNX graph."""

    def __init__(self, model: Model,
                 input_names: Optional[Sequence[str]] = None,
                 output_names: Optional[Sequence[str]] = None,
                 dtype: Optional[jnp.dtype] = None):
        self.model = model
        self.graph: Graph = model.graph
        self.dtype = dtype
        all_weights = {
            name: t.to_numpy() for name, t in self.graph.initializers.items()
        }
        if dtype is not None:
            # reduced-precision execution (e.g. bfloat16 on the MXU): every
            # float tensor — parameters AND folded constants — casts to the
            # compute dtype so matmuls/convs don't silently promote back to
            # f32 through a mixed operand. Outputs cast back to f32 at the
            # module boundary (OnnxModule.apply).
            all_weights = {
                k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
                else v
                for k, v in all_weights.items()
            }
        # Integer/small initializers are shape plumbing (Reshape targets,
        # Slice indices, Squeeze axes, ...). They must stay host constants so
        # shape computations fold at trace time; float tensors are the real
        # parameters and flow in as traced arguments.
        self.const_weights = {
            k: v
            for k, v in all_weights.items()
            if np.issubdtype(v.dtype, np.integer) or v.size <= 16
        }
        self.weights = {
            k: v for k, v in all_weights.items() if k not in self.const_weights
        }
        # pre-IR4 exporters list every initializer as a graph input too;
        # anything with an initializer is a weight/constant, never a feed
        declared_inputs = [
            vi.name
            for vi in self.graph.inputs
            if vi.name not in self.graph.initializers
        ]
        self.input_names = list(input_names or declared_inputs)
        self.output_names = list(
            output_names or [vi.name for vi in self.graph.outputs]
        )
        self.input_shapes = {
            vi.name: list(vi.shape) for vi in self.graph.inputs
        }
        missing = [
            n.op_type
            for n in self.graph.nodes
            if n.op_type not in onnx_ops.REGISTRY
        ]
        if missing:
            raise NotImplementedError(
                f"unsupported ONNX ops: {sorted(set(missing))}"
            )

    # -- execution --

    def __call__(self, weights: dict, *inputs):
        env: dict[str, object] = {"": None}
        env.update(self.const_weights)
        env.update(weights)
        for name, value in zip(self.input_names, inputs):
            env[name] = value

        for node in self.graph.nodes:
            try:
                args = [env[i] for i in node.inputs]
            except KeyError as e:
                raise KeyError(
                    f"node {node.op_type}:{node.name} missing input {e}"
                ) from None
            fn = onnx_ops.REGISTRY[node.op_type]
            outs = fn(node, args)
            for out_name, out_val in zip(node.outputs, outs):
                if out_name:
                    env[out_name] = out_val
        return tuple(env[name] for name in self.output_names)

    def as_jitted(self):
        """jit-wrapped single-output convenience callable."""
        fn = self

        @jax.jit
        def run(weights, *inputs):
            outs = fn(weights, *inputs)
            return outs if len(outs) > 1 else outs[0]

        return run


class OnnxModule:
    """Flax-model-shaped adapter so ONNX graphs plug into the framework's
    engines: ``module.apply(variables, x, train=False)``.

    ``layout`` adapts the engine's batch layout to the graph's expected
    input layout: "nhwc->nchw" for the tiled segmentation graphs (engine
    supplies NHWC float tiles; BDRC graphs take NCHW, reference:
    inference.py:152-153), "line" for recognizer graphs (engine supplies
    (B, H, W) in [-1, 1]; swap_hw / squeeze_channel flags are applied as the
    reference does at inference.py:407-411, 422-426).
    """

    def __init__(
        self,
        fn: OnnxGraphFunction,
        layout: str = "nhwc->nchw",
        swap_hw: bool = False,
        squeeze_channel: bool = True,
        vocab_size: Optional[int] = None,
    ):
        self.fn = fn
        self.layout = layout
        self.swap_hw = swap_hw
        self.squeeze_channel = squeeze_channel
        self.vocab_size = vocab_size

    @property
    def variables(self) -> dict:
        return self.fn.weights

    def apply(self, variables, x, train: bool = False):
        del train
        if self.fn.dtype is not None:
            x = x.astype(self.fn.dtype)
        if self.layout == "nhwc->nchw":
            x = jnp.transpose(x, (0, 3, 1, 2))
            (out,) = self.fn(variables, x)
            # segmentation engines expect NHWC logits
            return jnp.transpose(out, (0, 2, 3, 1)).astype(jnp.float32)
        if self.layout == "line":
            # engine provides (B, H, W)
            if self.swap_hw:
                x = jnp.transpose(x, (0, 2, 1))
            if not self.squeeze_channel:
                x = x[:, None, ...]
            (logits,) = self.fn(variables, x)
            # normalize output to (B, T, V): drop only singleton NON-batch
            # axes (some exporters keep a channel axis), never the batch dim
            # or the final (time, vocab) pair — a blanket squeeze would
            # mangle B=1 batches or V=1/T=1 outputs
            while logits.ndim > 3:
                extra = [
                    i for i in range(1, logits.ndim) if logits.shape[i] == 1
                ]
                if not extra:
                    raise ValueError(
                        f"cannot normalize recognizer output {logits.shape}"
                    )
                logits = jnp.squeeze(logits, axis=extra[0])
            if logits.ndim == 2:  # graph emitted a single unbatched example
                logits = logits[None]
            if self.vocab_size is not None and logits.shape[-1] != self.vocab_size:
                if logits.shape[1] == self.vocab_size:
                    logits = jnp.transpose(logits, (0, 2, 1))
            return logits.astype(jnp.float32)
        raise ValueError(f"unknown layout {self.layout}")


def load_onnx_module(
    path: str | Path,
    layout: str = "nhwc->nchw",
    input_layer: Optional[str] = None,
    output_layer: Optional[str] = None,
    swap_hw: bool = False,
    squeeze_channel: bool = True,
    vocab_size: Optional[int] = None,
    dtype: Optional[jnp.dtype] = None,
) -> OnnxModule:
    """Load an .onnx file into an engine-pluggable module.

    ``dtype=jnp.bfloat16`` executes the imported graph in reduced precision
    on the MXU (~2x conv/matmul throughput vs the f32 the exporter wrote);
    outputs come back f32. Off by default — the CER-parity guarantee is
    stated for f32 — and selectable per run via ``OCR_ONNX_BF16=1``
    (pipeline/builder.py)."""
    if dtype is None and os.environ.get("OCR_ONNX_BF16", "0") == "1":
        dtype = jnp.bfloat16
    model = load_model(path)
    fn = OnnxGraphFunction(
        model,
        input_names=[input_layer] if input_layer else None,
        output_names=[output_layer] if output_layer else None,
        dtype=dtype,
    )
    return OnnxModule(
        fn,
        layout=layout,
        swap_hw=swap_hw,
        squeeze_channel=squeeze_channel,
        vocab_size=vocab_size,
    )
