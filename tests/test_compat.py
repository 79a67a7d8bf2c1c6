"""Compat shims: drop-in onnxruntime / pyctcdecode / pyewts / botok.

Exercises each shim exactly the way the reference stack consumes the real
packages (reference: BDRC/inference.py:127-157,294,359-365 for ort;
:97-118 + label_encoder.py:69 for pyctcdecode; inference.py:452 for
pyewts), so code written against those APIs runs unmodified on this
framework.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest
import torch

MODS = ("onnxruntime", "pyctcdecode", "pyctcdecode.decoder", "pyewts", "botok")


@pytest.fixture
def shims():
    saved = {m: sys.modules.get(m) for m in MODS}
    for m in MODS:
        sys.modules.pop(m, None)
    from ocr_inference_tpu import compat

    installed = compat.install(force=True)
    yield installed
    for m, v in saved.items():
        if v is None:
            sys.modules.pop(m, None)
        else:
            sys.modules[m] = v


def test_install_registers_all(shims):
    assert all(shims.values())
    import onnxruntime, pyctcdecode, pyewts, botok  # noqa: F401

    assert "CPUExecutionProvider" in onnxruntime.get_available_providers()


def test_ort_session_like_the_reference(shims, tmp_path):
    """ort.InferenceSession + OrtValue round trip on a real exporter file,
    called exactly like Detection._predict (reference: inference.py:152-157)."""
    import onnxruntime as ort

    from ocr_inference_tpu.models.torch_twins import TUNet
    from ocr_inference_tpu.onnx.export_shim import torch_export

    torch.manual_seed(0)
    tm = TUNet(width=8).eval()
    path = str(tmp_path / "unet.onnx")
    torch_export(tm, torch.randn(1, 3, 64, 64), path,
                 input_names=["input"], output_names=["output"])

    session = ort.InferenceSession(path, providers=ort.get_available_providers())
    assert [i.name for i in session.get_inputs()] == ["input"]
    assert [o.name for o in session.get_outputs()] == ["output"]

    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    ort_batch = ort.OrtValue.ortvalue_from_numpy(x)
    out = session.run_with_ort_values(["output"], {"input": ort_batch})
    got = out[0].numpy()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-4

    # plain run() too (utils-style callers)
    got2 = session.run(["output"], {"input": x})[0]
    np.testing.assert_array_equal(got, got2)


def test_ctcdecode_decode_and_beams(shims):
    from pyctcdecode import build_ctcdecoder
    from pyctcdecode.decoder import OutputBeam

    labels = ["<blk>", "a", "b", "c"]
    dec = build_ctcdecoder(labels)

    # frames: a a <blk> b b c -> "abc"
    t = np.full((6, 4), -5.0, np.float32)
    for i, v in enumerate([1, 1, 0, 2, 2, 3]):
        t[i, v] = 5.0
    assert dec.decode(t) == "abc"

    beams = dec.decode_beams(t)
    assert isinstance(beams[0], OutputBeam)
    assert beams[0].text == "abc"
    assert beams[0].logit_score <= 0.0  # log-prob total
    assert len(beams) > 1 or beams[0].text == "abc"


def test_ctcdecode_blank_must_be_first(shims):
    from pyctcdecode import build_ctcdecoder

    with pytest.raises(ValueError, match="index 0"):
        build_ctcdecoder(["a", "<blk>", "b"])


def test_pyewts_and_botok(shims):
    import botok
    import pyewts

    from ocr_inference_tpu.text import to_unicode, tokenize_in_stacks

    conv = pyewts.pyewts()
    assert conv.toUnicode("ka") == to_unicode("ka")
    assert conv.toWylie(conv.toUnicode("bkra shis")) == "bkra shis"
    assert botok.tokenize_in_stacks(conv.toUnicode("ka")) == tokenize_in_stacks(
        conv.toUnicode("ka")
    )
