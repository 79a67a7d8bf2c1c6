"""Training CLI smoke test: tiny dataset, few steps, weights round-trip."""

import json

import cv2
import numpy as np


def test_train_cli_end_to_end(tmp_path):
    from ocr_inference_tpu.cli.train_cli import main

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    cfg = {
        "onnx-model": "ocr.onnx",
        "architecture": "Easter2",
        "version": "1",
        "input_width": 256,
        "input_height": 80,
        "input_layer": "input",
        "output_layer": "output",
        "encoder": "wylie",
        "squeeze_channel_dim": "yes",
        "swap_hw": "no",
        "charset": "kg' abcdefhijlmnoprstuwy",
        "add_blank": "yes",
    }
    (model_dir / "model_config.json").write_text(json.dumps(cfg))

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(
            str(data / f"l{i}.png"),
            rng.integers(0, 255, size=(40, 300, 3)).astype(np.uint8),
        )
        (data / f"l{i}.txt").write_text("ཀ་ག\n", encoding="utf-8")

    out = tmp_path / "weights.msgpack"
    rc = main(
        [
            "--model", str(model_dir),
            "--data", str(data),
            "--output", str(out),
            "--steps", "3",
            "--batch-size", "2",
            "--width", "256",
            "--log-every", "1",
        ]
    )
    assert rc == 0
    assert out.is_file()
    meta = json.loads((tmp_path / "weights.msgpack.json").read_text())
    assert meta["architecture"] == "Easter2"

    # trained weights load back into a recognition engine
    from ocr_inference_tpu.core.assets import read_ocr_model_config
    from ocr_inference_tpu.pipeline.builder import build_recognition_engine
    import shutil

    shutil.copy(out, model_dir / "weights.msgpack")
    config = read_ocr_model_config(str(model_dir / "model_config.json"))
    engine = build_recognition_engine(config)
    texts = engine.run_batch(
        [np.full((40, 200, 3), 128, np.uint8)]
    )
    assert isinstance(texts[0], str)
