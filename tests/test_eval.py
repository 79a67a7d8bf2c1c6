"""CER metric + evaluator tests."""

import json

import numpy as np
import pytest

from ocr_inference_tpu.eval import CERScorer, cer, levenshtein


def test_levenshtein():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_cer_corpus_level():
    # corpus CER = total distance / total ref length
    preds = ["abc", "xyz"]
    refs = ["abc", "xya"]
    assert cer(preds, refs) == pytest.approx(1 / 6)


def test_cer_tibetan():
    pred = "བཀྲ་ཤིས"
    ref = "བཀྲ་ཤིས་"
    assert cer([pred], [ref]) == pytest.approx(1 / len(ref))
    assert cer([ref], [ref]) == 0.0


def test_cer_scorer_validates():
    with pytest.raises(ValueError):
        CERScorer().compute(predictions=["a"], references=["a", "b"])


def test_evaluator_runs_with_random_weights(tmp_path):
    import cv2

    from ocr_inference_tpu.eval import OCREvaluator

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
        "charset": "abcdefghij",
        "add_blank": "yes",
    }
    (tmp_path / "model_config.json").write_text(json.dumps(cfg))
    img_path = tmp_path / "line.png"
    cv2.imwrite(str(img_path), np.full((40, 300, 3), 128, np.uint8))
    label_path = tmp_path / "line.txt"
    label_path.write_text("ཀ་ཁ\n", encoding="utf-8")

    ev = OCREvaluator(str(tmp_path / "model_config.json"), allow_random=True)
    assert ev.get_architecture() == "Easter2"
    score = ev.evaluate(str(img_path), str(label_path))
    assert 0.0 <= score <= 10.0

    result = ev.evaluate_distribution(
        "dist0", [str(img_path)], [str(label_path)]
    )
    assert result.distribution == "dist0"
    assert len(result.cer_scores) == 1


def test_cer_bootstrap_ci_contains_point_and_orders():
    from ocr_inference_tpu.eval.cer import cer, cer_bootstrap_ci

    preds = ["abc", "abd", "xyz", "abc"] * 10
    refs = ["abc", "abc", "abc", "abc"] * 10
    point = cer(preds, refs)
    lo, hi = cer_bootstrap_ci(preds, refs, n_boot=500, seed=1)
    assert lo <= point <= hi
    assert 0.0 <= lo < hi <= 1.5
    # deterministic for a fixed seed
    assert (lo, hi) == cer_bootstrap_ci(preds, refs, n_boot=500, seed=1)
    # degenerate: perfect predictions give a zero-width interval at 0
    assert cer_bootstrap_ci(["a"] * 5, ["a"] * 5) == (0.0, 0.0)
