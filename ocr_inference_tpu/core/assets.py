"""Model asset management: HF downloads + JSON config readers.

Reads the exact per-model JSON config format shipped with the BDRC
HuggingFace repos (reference: BDRC/utils.py:105-436) so existing model repos
load unmodified, including the "yes"/"no" string booleans.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from ocr_inference_tpu.core.config import CHARSETENCODER
from ocr_inference_tpu.core.data import (
    KenLMConfig,
    LayoutDetectionConfig,
    LineDetectionConfig,
    OCRModel,
    OCRModelConfig,
    generate_guid,
)


def download_model(identifier: str, local_root: str = "Models") -> str:
    """Snapshot a HF model repo and return its unique JSON config path
    (reference: BDRC/utils.py:105-129)."""
    from huggingface_hub import snapshot_download

    model_path = Path(
        snapshot_download(
            repo_id=identifier,
            repo_type="model",
            local_dir=f"{local_root}/{identifier}",
            force_download=True,
        )
    )
    json_files = list(model_path.glob("*.json"))
    if len(json_files) == 0:
        raise FileNotFoundError(f"No JSON config file found in {model_path}")
    if len(json_files) > 1:
        raise RuntimeError(
            f"Multiple JSON files found in {model_path}: "
            f"{[p.name for p in json_files]} — cannot decide which is the model config"
        )
    return str(json_files[0])


def download_kenlm(identifier: str, local_root: str = "Models") -> tuple[str, str]:
    """Snapshot a KenLM repo, return (.binary, .arpa) paths
    (reference: BDRC/utils.py:132-159)."""
    from huggingface_hub import snapshot_download

    lm_dir = Path(
        snapshot_download(
            repo_id=identifier,
            repo_type="model",
            local_dir=f"{local_root}/{identifier}",
            force_download=True,
        )
    )
    bin_files = list(lm_dir.glob("*.binary"))
    arpa_files = list(lm_dir.glob("*.arpa"))
    if len(bin_files) == 0:
        raise FileNotFoundError(f"No .binary file found in {lm_dir}")
    if len(arpa_files) == 0:
        raise FileNotFoundError(f"No .arpa file found in {lm_dir}")
    if len(bin_files) > 1:
        raise RuntimeError(f"Multiple .binary files found in {lm_dir}")
    if len(arpa_files) > 1:
        raise RuntimeError(f"Multiple .arpa files found in {lm_dir}")
    return str(bin_files[0]), str(arpa_files[0])


def _yes(value) -> bool:
    # The shipped configs encode booleans as "yes"/"no" strings
    # (reference: BDRC/utils.py:371-376); accept real booleans too.
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() == "yes"


def read_ocr_model_config(config_file: str) -> OCRModelConfig:
    """Parse a recognizer model_config.json (reference: BDRC/utils.py:349-393)."""
    model_dir = os.path.dirname(config_file)
    with open(config_file, encoding="utf-8") as f:
        cfg = json.load(f)

    return OCRModelConfig(
        model_file=os.path.join(model_dir, cfg["onnx-model"]),
        architecture=cfg["architecture"],
        input_width=int(cfg["input_width"]),
        input_height=int(cfg["input_height"]),
        input_layer=cfg["input_layer"],
        output_layer=cfg["output_layer"],
        squeeze_channel=_yes(cfg["squeeze_channel_dim"]),
        swap_hw=_yes(cfg["swap_hw"]),
        encoder=CHARSETENCODER[cfg["encoder"]],
        charset=get_charset(cfg["charset"]),
        add_blank=_yes(cfg["add_blank"]),
        version=str(cfg["version"]),
    )


def read_line_model_config(config_file: str) -> LineDetectionConfig:
    """Parse a line segmentation config (reference: BDRC/utils.py:162-180)."""
    model_dir = os.path.dirname(config_file)
    with open(config_file, encoding="utf-8") as f:
        cfg = json.load(f)
    return LineDetectionConfig(
        checkpoint=os.path.join(model_dir, cfg["checkpoint"]),
        onnx_file=os.path.join(model_dir, cfg["onnx-model"]),
        architecture=cfg["architecture"],
        patch_size=int(cfg["patch_size"]),
        classes=cfg["classes"],
    )


def read_layout_model_config(config_file: str) -> LayoutDetectionConfig:
    """Parse a layout segmentation config (reference: BDRC/utils.py:183-207).

    Note: the reference defaults architecture to "deeplabv3" when absent but
    then unconditionally re-reads the key (utils.py:191-196), crashing on
    configs without it — here the default actually takes effect.
    """
    model_dir = os.path.dirname(config_file)
    with open(config_file, encoding="utf-8") as f:
        cfg = json.load(f)
    architecture = cfg.get("architecture", "deeplabv3")
    return LayoutDetectionConfig(
        checkpoint=os.path.join(model_dir, cfg["checkpoint"]),
        onnx_file=os.path.join(model_dir, cfg["onnx-model"]),
        architecture=architecture,
        patch_size=int(cfg["patch_size"]),
        classes=cfg["classes"],
    )


def get_charset(charset: str | list[str]) -> list[str]:
    """Charset string or list -> list of unit strings
    (reference: BDRC/utils.py:210-217)."""
    return list(charset)


def import_local_model(model_path: str) -> OCRModel | None:
    """Load an OCRModel from a directory holding model_config.json
    (reference: BDRC/utils.py:322-346)."""
    if not os.path.isdir(model_path):
        return None
    config_file = os.path.join(model_path, "model_config.json")
    if not os.path.isfile(config_file):
        return None
    config = read_ocr_model_config(config_file)
    return OCRModel(
        guid=generate_guid(1),
        name=Path(model_path).name,
        path=model_path,
        config=config,
    )


def parse_arpa_unigrams(arpa_path: str | Path) -> list[str] | None:
    """Extract the \\1-grams: token column from an ARPA LM file
    (reference: BDRC/utils.py:395-427)."""
    unigrams: list[str] = []
    in_1grams = False
    with open(arpa_path, "r", encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if line == r"\1-grams:":
                in_1grams = True
                continue
            if in_1grams and line.startswith("\\"):
                break
            if in_1grams:
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) >= 2:
                    unigrams.append(parts[1])
    return unigrams or None


def get_kenlm_config(model_path: str | Path, arpa_file: str | Path) -> KenLMConfig:
    """Bundle LM paths + unigrams (reference: BDRC/utils.py:429-436)."""
    return KenLMConfig(model_path, arpa_file, parse_arpa_unigrams(arpa_file))


def get_filename(file_path: str) -> str:
    """Basename without extension (reference: BDRC/utils.py:232-244)."""
    segments = os.path.basename(file_path).split(".")[:-1]
    return ".".join(segments) if segments else os.path.basename(file_path)
