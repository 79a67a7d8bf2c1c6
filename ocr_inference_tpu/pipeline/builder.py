"""Assemble engines/pipelines from model directories.

Bridges the reference's asset layout (model dirs with model_config.json /
config.json + weight files, reference: BDRC/utils.py:162-393, cli.py:49-67)
to the framework's engines. Weight resolution order for a configured model
file ``X.onnx``:

1. ``X.msgpack`` (or ``weights.msgpack``) next to it — native Flax params;
2. the ONNX file itself — imported through the framework's own ONNX
   reader (ocr_inference_tpu.onnx) into a jitted executor;
3. ``allow_random=True`` — architecture built with fresh params (benchmarks,
   smoke tests).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
from jax.sharding import Mesh

from ocr_inference_tpu.core.data import (
    BatchConfig,
    KenLMConfig,
    LayoutDetectionConfig,
    LineDetectionConfig,
    OCRModelConfig,
)
from ocr_inference_tpu.models import DeepLabV3Plus, UNet, build_recognizer
from ocr_inference_tpu.models.params import (
    init_recognizer,
    init_segmentation,
    load_params,
)
from ocr_inference_tpu.pipeline.engines import RecognitionEngine, SegmentationEngine
from ocr_inference_tpu.pipeline.ocr_pipeline import OCRPipeline


def _find_weights(model_file: str) -> Optional[Path]:
    """Locate native weights next to the configured model file."""
    if not model_file:
        return None
    p = Path(model_file)
    candidates = [
        p.with_suffix(".msgpack"),
        p.parent / "weights.msgpack",
    ]
    for c in candidates:
        if c.is_file():
            return c
    return None


def _resolve_variables(model, init_fn, model_file: str, allow_random: bool,
                      what: str):
    weights = _find_weights(model_file)
    template = init_fn()
    if weights is not None:
        return load_params(template, weights)
    if allow_random:
        return template
    raise FileNotFoundError(
        f"No weights found for {what}: {model_file} "
        "(pass allow_random=True for smoke runs)"
    )


def _has_onnx(model_file: str) -> bool:
    return bool(model_file) and model_file.endswith(".onnx") and os.path.isfile(
        model_file
    )


def build_recognition_engine(
    config: OCRModelConfig,
    kenlm_config: Optional[KenLMConfig] = None,
    batch_cfg: Optional[BatchConfig] = None,
    allow_random: bool = False,
    dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
) -> RecognitionEngine:
    vocab_size = len(config.charset) + (1 if config.add_blank else 0)
    # Prefer native msgpack weights; else execute the .onnx graph directly
    # through the framework's ONNX executor (reference models load unchanged).
    if _find_weights(config.model_file) is None and _has_onnx(config.model_file):
        from ocr_inference_tpu.onnx import load_onnx_module

        module = load_onnx_module(
            config.model_file,
            layout="line",
            input_layer=config.input_layer,
            output_layer=config.output_layer,
            swap_hw=config.swap_hw,
            squeeze_channel=config.squeeze_channel,
            vocab_size=vocab_size,
        )
        return RecognitionEngine(
            module, module.variables, config, kenlm_config, batch_cfg,
            mesh=mesh,
        )
    # architecture geometry travels in the weight sidecar (save_params
    # meta) so reduced trained variants (width_mult, stem) reload exactly
    from ocr_inference_tpu.models.params import load_meta

    weights = _find_weights(config.model_file)
    meta = (load_meta(weights) if weights is not None else None) or {}
    kwargs = {
        k: t(meta[k])
        for k, t in (
            ("width_mult", float), ("stem_features", int), ("hidden", int),
        )
        if k in meta
    }
    model = build_recognizer(
        config.architecture, vocab_size, dtype=dtype, **kwargs
    )
    variables = _resolve_variables(
        model,
        lambda: init_recognizer(model, config.input_height, 256),
        config.model_file,
        allow_random,
        f"recognizer ({config.architecture})",
    )
    return RecognitionEngine(
        model, variables, config, kenlm_config, batch_cfg, mesh=mesh
    )


def build_detection_engine(
    config: LineDetectionConfig | LayoutDetectionConfig,
    allow_random: bool = False,
    dtype=jnp.bfloat16,
    mesh: Optional[Mesh] = None,
) -> SegmentationEngine:
    is_layout = isinstance(config, LayoutDetectionConfig)
    n_classes = len(config.classes) if is_layout else 1
    mode = "layout" if is_layout else "line"
    if _find_weights(config.onnx_file) is None and _has_onnx(config.onnx_file):
        from ocr_inference_tpu.onnx import load_onnx_module

        module = load_onnx_module(config.onnx_file, layout="nhwc->nchw")
        return SegmentationEngine(
            module,
            module.variables,
            mode=mode,
            patch_size=config.patch_size,
            classes=config.classes,
            mesh=mesh,
        )
    if is_layout or config.architecture.lower().startswith("deeplab"):
        model = DeepLabV3Plus(classes=n_classes, dtype=dtype)
    else:
        # UNet hyperparameters travel in the weight sidecar (save_params
        # meta), so a trained variant (width, space-to-depth stem) reloads
        # into the exact architecture it was trained as.
        from ocr_inference_tpu.models.params import load_meta

        weights = _find_weights(config.onnx_file)
        meta = (load_meta(weights) if weights is not None else None) or {}
        # Fresh (random-init) detectors default to the space-to-depth stem:
        # ~4x fewer detect FLOPs at BETTER end-to-end CER once the
        # narrow-component opening is applied (EVAL_r03: 0.70% vs the
        # stride-1 baseline's 0.89%). Weight files keep whatever geometry
        # their sidecar records; meta-less weights stay stride 1 (the only
        # lineage that predates the sidecar).
        default_stem = 2 if weights is None else 1
        model = UNet(
            classes=n_classes,
            width=int(meta.get("width", 32)),
            stem_stride=int(meta.get("stem_stride", default_stem)),
            dtype=dtype,
        )
    variables = _resolve_variables(
        model,
        lambda: init_segmentation(model, config.patch_size),
        config.onnx_file,
        allow_random,
        f"detector ({config.architecture})",
    )
    # space-to-depth detectors get the on-device narrow-component opening:
    # the stem2 UNet leaves thin tile-edge artifacts the reference-parity
    # contour filter passes (see SegmentationEngine.open_width_frac)
    open_frac = 0.02 if getattr(model, "stem_stride", 1) > 1 else 0.0
    return SegmentationEngine(
        model,
        variables,
        mode=mode,
        patch_size=config.patch_size,
        classes=config.classes,
        mesh=mesh,
        open_width_frac=open_frac,
    )


def build_pipeline(
    ocr_config: OCRModelConfig,
    line_config: LineDetectionConfig | LayoutDetectionConfig,
    kenlm_config: Optional[KenLMConfig] = None,
    batch_cfg: Optional[BatchConfig] = None,
    allow_random: bool = False,
    use_line_prepadding: bool = False,
    mesh: Optional[Mesh] = None,
    dtype=jnp.bfloat16,
) -> OCRPipeline:
    """Full pipeline from configs (reference: OCRPipeline ctor,
    inference.py:440-463). With ``mesh``, both engines run data-parallel
    over its data axis (the reference is strictly single-stream,
    inference.py:630-635). ``dtype`` sets both engines' compute precision
    (bf16 rides the MXU; f32 for differential/parity runs)."""
    rec = build_recognition_engine(
        ocr_config, kenlm_config, batch_cfg, allow_random=allow_random,
        mesh=mesh, dtype=dtype,
    )
    det = build_detection_engine(line_config, allow_random=allow_random,
                                 mesh=mesh, dtype=dtype)
    return OCRPipeline(rec, det, line_config, use_line_prepadding)


def default_line_config(patch_size: int = 512) -> LineDetectionConfig:
    """Stand-in line config matching the reference CLI's hard-coded default
    (reference: cli.py:57, de-bugged — the reference passes kwargs that do
    not exist on the dataclass)."""
    return LineDetectionConfig(
        checkpoint="",
        onnx_file="Models/Lines/PhotiLines.onnx",
        architecture="unet",
        patch_size=patch_size,
        classes=["line"],
    )


def default_layout_config(patch_size: int = 512) -> LayoutDetectionConfig:
    """Reference cli.py:59-65 layout default."""
    return LayoutDetectionConfig(
        checkpoint="",
        onnx_file="Models/Layout/photi.onnx",
        architecture="deeplabv3",
        patch_size=patch_size,
        classes=["background", "image", "line", "caption", "margin"],
    )
