"""Self-contained ONNX support: wire-format parser/writer, JAX op
lowerings, and a jitted graph executor (replaces onnxruntime)."""

from ocr_inference_tpu.onnx.runner import (  # noqa: F401
    OnnxGraphFunction,
    OnnxModule,
    load_onnx_module,
)
from ocr_inference_tpu.onnx.wire import (  # noqa: F401
    Model,
    encode_model,
    encode_node,
    encode_tensor,
    encode_value_info,
    load_model,
    parse_model,
)
