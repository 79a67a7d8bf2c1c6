"""Core layer tests: config readers, registry parity, charset handling."""

import json

import pytest

from ocr_inference_tpu.core import assets, config, data


def _write_ocr_config(tmp_path, **overrides):
    cfg = {
        "onnx-model": "model.onnx",
        "architecture": "Easter2",
        "version": "1.0",
        "input_width": 3000,
        "input_height": 80,
        "input_layer": "input",
        "output_layer": "output",
        "encoder": "wylie",
        "squeeze_channel_dim": "no",
        "swap_hw": "no",
        "charset": "abcdefg",
        "add_blank": "yes",
    }
    cfg.update(overrides)
    path = tmp_path / "model_config.json"
    path.write_text(json.dumps(cfg), encoding="utf-8")
    return path


def test_read_ocr_model_config_yes_no_booleans(tmp_path):
    path = _write_ocr_config(tmp_path)
    cfg = assets.read_ocr_model_config(str(path))
    assert cfg.add_blank is True
    assert cfg.squeeze_channel is False
    assert cfg.swap_hw is False
    assert cfg.encoder == data.CharsetEncoder.WYLIE
    assert cfg.input_width == 3000 and cfg.input_height == 80
    assert cfg.charset == list("abcdefg")
    assert cfg.model_file.endswith("model.onnx")


def test_read_ocr_model_config_list_charset(tmp_path):
    path = _write_ocr_config(tmp_path, charset=["ka", "kha", "ga"], encoder="stack")
    cfg = assets.read_ocr_model_config(str(path))
    assert cfg.charset == ["ka", "kha", "ga"]
    assert cfg.encoder == data.CharsetEncoder.STACK


def test_import_local_model(tmp_path):
    _write_ocr_config(tmp_path)
    model = assets.import_local_model(str(tmp_path))
    assert model is not None
    assert model.name == tmp_path.name
    assert model.config.architecture == "Easter2"
    assert assets.import_local_model(str(tmp_path / "nope")) is None


def test_read_line_model_config(tmp_path):
    cfg = {
        "checkpoint": "seg.pth",
        "onnx-model": "seg.onnx",
        "architecture": "unet",
        "patch_size": 512,
        "classes": ["background", "line"],
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg), encoding="utf-8")
    parsed = assets.read_line_model_config(str(p))
    assert parsed.patch_size == 512
    assert parsed.classes == ["background", "line"]


def test_read_layout_model_config_default_architecture(tmp_path):
    cfg = {
        "checkpoint": "seg.pth",
        "onnx-model": "seg.onnx",
        "patch_size": 512,
        "classes": ["background", "image", "line", "caption", "margin"],
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg), encoding="utf-8")
    parsed = assets.read_layout_model_config(str(p))
    assert parsed.architecture == "deeplabv3"


def test_registry_parity():
    # Same keys as reference Config.py so CLI flags resolve identically.
    assert set(config.LINE_MODES) == {"line", "layout"}
    assert set(config.ENCODINGS) == {"unicode", "wylie"}
    assert set(config.EXPORTERS) == {"xml", "json", "text"}
    assert len(config.MODEL_DICT) == 11
    assert config.OCR_ARCHITECTURES["Easter2b"] == data.OCRArchitecture.EASTER2
    assert config.LINE_DETECTION_SCHEMA.names == [
        "image_name",
        "image_width",
        "image_height",
        "num_contours",
        "contours",
        "bboxes",
    ]


def test_parse_arpa_unigrams(tmp_path):
    arpa = "\n".join(
        [
            "\\data\\",
            "ngram 1=3",
            "",
            "\\1-grams:",
            "-1.0 <s> -0.5",
            "-2.0 ka -0.1",
            "-3.0 kha",
            "\\2-grams:",
            "-0.5 <s> ka",
            "\\end\\",
        ]
    )
    p = tmp_path / "lm.arpa"
    p.write_text(arpa, encoding="utf-8")
    assert assets.parse_arpa_unigrams(p) == ["<s>", "ka", "kha"]


def test_get_filename():
    assert assets.get_filename("/a/b/page.0001.jpg") == "page.0001"
    assert assets.get_filename("plain") == "plain"


def test_guid_deterministic_clock_seq():
    g1 = data.generate_guid(23)
    g2 = data.generate_guid(23)
    assert g1 != g2  # uuid1 embeds a timestamp; only clock_seq is fixed
