"""JSONL serving loop: protocol, per-request responses, error isolation."""

import io
import json

import cv2
import numpy as np

from ocr_inference_tpu.cli.serve_cli import main


def _model_dir(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    cfg = {
        "onnx-model": "ocr.onnx", "architecture": "Easter2", "version": "1",
        "input_width": 512, "input_height": 80, "input_layer": "input",
        "output_layer": "output", "encoder": "wylie",
        "squeeze_channel_dim": "yes", "swap_hw": "no",
        "charset": "kg'abcdefh", "add_blank": "yes",
    }
    (d / "model_config.json").write_text(json.dumps(cfg))
    return d


def test_serve_loop_dynamic_batching_over_pipe():
    """serve_loop + _LineReader(fd=...) over a real os.pipe (the config-6
    bench harness, bench.py run_serve_bench): queued requests drain into ONE
    burst, each page emits exactly once, EOF ends the session."""
    import os

    from ocr_inference_tpu.cli.serve_cli import _LineReader, serve_loop

    bursts, emitted = [], []

    class StubRecord:
        def __init__(self, name):
            self.name = name

    class StubRunner:
        def run(self, images, on_page_done=None, **kw):
            images = list(images)
            bursts.append(len(images))
            recs = [StubRecord(name) for name, _ in images]
            for r in recs:
                on_page_done(r)
            return recs

    r_fd, w_fd = os.pipe()
    # one request, then a queued burst of 3, then EOF
    os.write(w_fd, json.dumps({"image": "a.png"}).encode() + b"\n")
    for p in ("b.png", "c.png", "d.png"):
        os.write(w_fd, json.dumps({"image": p}).encode() + b"\n")
    os.close(w_fd)

    serve_loop(
        StubRunner(), _LineReader(fd=r_fd), lambda p: (lambda: None),
        emitted.append, lambda obj: (_ for _ in ()).throw(AssertionError(obj)),
        encoding=None,
    )
    os.close(r_fd)
    # the blocking read grabs a.png; the zero-timeout drain batches the
    # already-queued b/c/d into the same burst (all 4 were queued before the
    # loop started, so one burst of 4 is also the correct outcome)
    assert sum(bursts) == 4
    assert len(bursts) <= 2
    assert [r.name for r in emitted] == ["a.png", "b.png", "c.png", "d.png"]


def test_serve_loop_overload_shedding():
    """max_queue bounds a burst: overflow pages get a 429-style shed
    response immediately, admitted pages are served, and shedding applies
    per burst (a later, smaller burst is admitted in full)."""
    import os

    from ocr_inference_tpu.cli.serve_cli import _LineReader, serve_loop

    bursts, emitted, errors = [], [], []

    class StubRecord:
        def __init__(self, name):
            self.name = name

    class StubRunner:
        def run(self, images, on_page_done=None, **kw):
            images = list(images)
            bursts.append([name for name, _ in images])
            recs = [StubRecord(name) for name, _ in images]
            for r in recs:
                on_page_done(r)
            return recs

    r_fd, w_fd = os.pipe()
    # a burst of 5 queued before the loop starts, cap 3 -> 2 shed
    for p in ("a.png", "b.png", "c.png", "d.png", "e.png"):
        os.write(w_fd, json.dumps({"image": p}).encode() + b"\n")
    os.close(w_fd)

    serve_loop(
        StubRunner(), _LineReader(fd=r_fd), lambda p: (lambda: None),
        emitted.append, errors.append, encoding=None, max_queue=3,
    )
    os.close(r_fd)
    assert [r.name for r in emitted] == ["a.png", "b.png", "c.png"]
    assert [e["image"] for e in errors] == ["d.png", "e.png"]
    assert all(e["status"] == "shed" and e["code"] == 429 for e in errors)
    assert all(len(b) <= 3 for b in bursts)


def test_serve_jsonl_protocol(tmp_path, monkeypatch, capsys):
    model_dir = _model_dir(tmp_path)
    page = tmp_path / "page.png"
    cv2.imwrite(str(page), np.full((600, 900, 3), 230, np.uint8))

    requests = "\n".join([
        json.dumps({"image": str(page)}),
        "not json",
        json.dumps({"wrong": "key"}),
        json.dumps({"images": [str(page), str(tmp_path / "missing.png")]}),
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(requests))

    rc = main([
        "--model", str(model_dir),
        "--allow-random-weights",
        "--window-pages", "1",
    ])
    assert rc == 0
    out_lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    # 1 page + 1 bad-json error + 1 bad-request error + 2 batch pages
    assert len(out_lines) == 5
    assert out_lines[0]["image"] == str(page)
    assert out_lines[0]["status"] in ("success", "failed")
    assert "bad request" in out_lines[1]["error"]
    assert "no 'image'" in out_lines[2]["error"]
    # the missing file fails in isolation; the good page still answers
    statuses = {r["image"]: r["status"] for r in out_lines[3:]}
    assert statuses[str(tmp_path / "missing.png")] == "failed"
    assert str(page) in statuses
