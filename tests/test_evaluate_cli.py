"""Evaluate CLI test with a tiny synthetic distribution dataset."""

import json

import cv2
import numpy as np

from ocr_inference_tpu.cli.evaluate_cli import collect_distributions, main


def _make_dataset(root):
    for dist in ["uchan_a", "uchan_b"]:
        d = root / dist
        d.mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(
                str(d / f"line{i}.png"),
                np.full((40, 260, 3), 200, np.uint8),
            )
            (d / f"line{i}.txt").write_text("ཀ་ཁ་ག\n", encoding="utf-8")


def test_collect_distributions(tmp_path):
    _make_dataset(tmp_path)
    dists = collect_distributions(str(tmp_path))
    assert set(dists) == {"uchan_a", "uchan_b"}
    images, labels = dists["uchan_a"]
    assert len(images) == len(labels) == 2


def test_evaluate_cli_end_to_end(tmp_path):
    _make_dataset(tmp_path / "data")
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    cfg = {
        "onnx-model": "ocr.onnx",
        "architecture": "Easter2",
        "version": "1",
        "input_width": 512,
        "input_height": 80,
        "input_layer": "input",
        "output_layer": "output",
        "encoder": "wylie",
        "squeeze_channel_dim": "yes",
        "swap_hw": "no",
        "charset": "kg'abcdefh",
        "add_blank": "yes",
    }
    (model_dir / "model_config.json").write_text(json.dumps(cfg))

    out = tmp_path / "scores"
    rc = main(
        [
            "--model", str(model_dir),
            "--dataset", str(tmp_path / "data"),
            "--output", str(out),
            "--allow-random-weights",
        ]
    )
    assert rc == 0
    score_txt = (out / "Easter2.txt").read_text().strip().splitlines()
    assert len(score_txt) == 2
    assert score_txt[0].startswith("uchan_a\t")
    detail = json.loads((out / "Easter2.json").read_text())
    assert "per_image" in detail["uchan_a"]
