"""``onnxruntime``-compatible module surface backed by the JAX executor.

Implements the API the reference stack consumes (reference:
BDRC/inference.py:127-130,152-157,294,359-365; BDRC/utils.py:220-229):
``InferenceSession`` with ``run`` / ``run_with_ort_values`` /
``get_inputs`` / ``get_outputs``, ``OrtValue.ortvalue_from_numpy``, and
``get_available_providers``. Graphs execute through
``ocr_inference_tpu.onnx.runner.OnnxGraphFunction`` under ``jax.jit`` —
on TPU when one is attached, the CPU backend otherwise — so ONNX-session
code written for the reference runs unmodified on this framework.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

__version__ = "0.0-ocr_inference_tpu-compat"


def get_available_providers() -> list[str]:
    import jax

    providers = []
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform != "cpu":
        providers.append("TPUExecutionProvider")
    providers.append("CPUExecutionProvider")
    return providers


def get_device() -> str:
    return "TPU" if "TPUExecutionProvider" in get_available_providers() else "CPU"


class OrtValue:
    """Host-array holder mirroring onnxruntime.OrtValue's consumed API."""

    def __init__(self, array):
        self._array = np.asarray(array)

    @staticmethod
    def ortvalue_from_numpy(array, device_type: str = "cpu", device_id: int = 0):
        return OrtValue(array)

    def numpy(self) -> np.ndarray:
        return self._array

    def shape(self):
        return list(self._array.shape)


class NodeArg:
    def __init__(self, name: str, shape, elem_type: str = "tensor(float)"):
        self.name = name
        self.shape = shape
        self.type = elem_type


class SessionOptions:
    """Accepted and ignored — the executor has no session-level knobs."""

    def __init__(self):
        self.log_severity_level = 2
        self.intra_op_num_threads = 0
        self.inter_op_num_threads = 0


class InferenceSession:
    """onnxruntime.InferenceSession drop-in over the framework's graph
    executor. One jitted callable per requested output set; XLA caches
    compilations per input shape."""

    def __init__(
        self,
        path_or_bytes,
        sess_options: Optional[SessionOptions] = None,
        providers: Optional[Sequence[str]] = None,
        **_: Any,
    ):
        from ocr_inference_tpu.onnx.runner import OnnxGraphFunction
        from ocr_inference_tpu.onnx.wire import load_model, parse_model

        if isinstance(path_or_bytes, (bytes, bytearray)):
            model = parse_model(bytes(path_or_bytes))
        else:
            model = load_model(path_or_bytes)
        self._model = model
        self._providers = list(providers or get_available_providers())
        self._fn = OnnxGraphFunction(model)
        self._graph_outputs = list(self._fn.output_names)
        # alternate output selections get their own function lazily;
        # each entry is [jitted_or_eager_callable, raw_fn]
        self._variants: dict[tuple[str, ...], list] = {
            tuple(self._graph_outputs): [self._fn.as_jitted(), self._fn]
        }

    # -- introspection --------------------------------------------------

    def get_inputs(self) -> list[NodeArg]:
        infos = {vi.name: vi for vi in self._model.graph.inputs}
        return [
            NodeArg(name, list(infos[name].shape) if name in infos else None)
            for name in self._fn.input_names
        ]

    def get_outputs(self) -> list[NodeArg]:
        infos = {vi.name: vi for vi in self._model.graph.outputs}
        return [
            NodeArg(name, list(infos[name].shape) if name in infos else None)
            for name in self._graph_outputs
        ]

    def get_providers(self) -> list[str]:
        return self._providers

    # -- execution ------------------------------------------------------

    def _fn_for(self, output_names: Optional[Sequence[str]]) -> list:
        key = tuple(
            output_names if output_names is not None else self._graph_outputs
        )
        if key not in self._variants:
            from ocr_inference_tpu.onnx.runner import OnnxGraphFunction

            fn = OnnxGraphFunction(self._model, output_names=list(key))
            self._variants[key] = [fn.as_jitted(), fn]
        return self._variants[key]

    def _execute(self, output_names, input_feed: dict) -> list[np.ndarray]:
        import jax
        import jax.numpy as jnp

        slot = self._fn_for(output_names)
        args = []
        for name in self._fn.input_names:
            if name not in input_feed:
                raise ValueError(f"missing input {name!r}")
            value = input_feed[name]
            if isinstance(value, OrtValue):
                value = value.numpy()
            args.append(jnp.asarray(np.asarray(value)))
        try:
            outs = slot[0](self._fn.weights, *args)
        except jax.errors.TracerArrayConversionError:
            # graphs whose shape/pad operands are computed tensors cannot
            # trace under jit — run the op interpreter eagerly instead
            # (every op still executes through JAX) and remember the choice
            slot[0] = slot[1]
            outs = slot[0](self._fn.weights, *args)
        return [np.asarray(o) for o in outs]

    def run(self, output_names, input_feed: dict, run_options=None):
        return self._execute(output_names, input_feed)

    def run_with_ort_values(self, output_names, input_feed: dict,
                            run_options=None):
        return [OrtValue(o) for o in self._execute(output_names, input_feed)]

    def end_profiling(self) -> str:  # pragma: no cover - API parity only
        return ""
