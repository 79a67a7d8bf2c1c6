"""bocr-selftrain smoke: tiny train->eval run, then --weights eval-only."""

import json


def test_selftrain_tiny_then_eval_only(tmp_path):
    from ocr_inference_tpu.cli.selftrain_cli import main

    out1 = tmp_path / "run1"
    rc = main([
        "--out", str(out1),
        "--rec-steps", "2", "--seg-steps", "2",
        "--rec-batch", "2", "--seg-batch", "2",
        "--eval-pages", "1", "--lm-order", "0",
        "--canvas-width", "256", "--log-every", "1",
    ])
    assert rc == 0
    r1 = json.loads((out1 / "EVAL.json").read_text())
    assert r1["rec_steps"] == 2 and r1["seg_steps"] == 2
    assert (out1 / "recognizer.msgpack").is_file()
    assert (out1 / "lines.msgpack").is_file()

    # eval-only: reuse the weights, skip training entirely
    out2 = tmp_path / "run2"
    rc = main([
        "--out", str(out2),
        "--weights", str(out1),
        "--eval-pages", "1", "--lm-order", "0",
        "--canvas-width", "256",
    ])
    assert rc == 0
    r2 = json.loads((out2 / "EVAL.json").read_text())
    assert r2["rec_steps"] == 0 and r2["seg_steps"] == 0
    # same (untrained-ish) weights, same seeded eval page -> same CER
    assert r2["per_page_cer"] == r1["per_page_cer"]
