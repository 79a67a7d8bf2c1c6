"""Witten-Bell ARPA builder: exact normalization under the real scorer.

The built ARPA is loaded with the framework's ArpaLM (the same scorer the
CTC beam search uses) and checked as a probability model: for randomized
contexts of every order — seen, partially seen, and unseen — the scorer's
distribution over the full vocabulary must sum to 1. This pins both the
smoothing math in decode/ngram_builder.py and its agreement with the
scorer's backoff semantics (a mismatch in either breaks the sum).
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_inference_tpu.decode.arpa_lm import ArpaLM
from ocr_inference_tpu.decode.ngram_builder import build_char_arpa

TOKENS = ["k", "kh", "g", "ng", "a", "i", "u", "§", "tsh"]


def make_corpus(n_lines: int, seed: int, joined: bool) -> list[str]:
    rng = np.random.RandomState(seed)
    lines = []
    for _ in range(n_lines):
        n = rng.randint(3, 30)
        toks = [TOKENS[rng.randint(len(TOKENS))] for _ in range(n)]
        lines.append(" ".join(toks) if joined else "".join(toks))
    return lines


@pytest.mark.parametrize("order", [2, 3, 4])
def test_token_arpa_normalized(tmp_path, order):
    corpus = make_corpus(60, seed=order, joined=True)
    path = build_char_arpa(corpus, tmp_path / "lm.arpa", order=order,
                           tokens=True)
    lm = ArpaLM(path)
    assert lm.order == order
    vocab = [g[0] for g in lm._table if len(g) == 1 and g[0] != "<s>"]
    rng = np.random.RandomState(0)
    contexts = [()]
    # seen contexts straight from the table
    grams = [g for g in lm._table if 1 <= len(g) < order]
    for i in range(0, len(grams), max(1, len(grams) // 8)):
        contexts.append(grams[i])
    # unseen/partially-seen contexts
    for _ in range(4):
        n = rng.randint(1, order)
        contexts.append(tuple(
            TOKENS[rng.randint(len(TOKENS))] for _ in range(n)
        ))
    contexts.append(("never-seen-token",))
    for ctx in contexts:
        total = sum(10.0 ** lm.score(ctx, w) for w in vocab)
        assert total == pytest.approx(1.0, abs=1e-6), (
            f"sum over vocab for context {ctx} = {total}"
        )


def test_char_mode_maps_spaces(tmp_path):
    path = build_char_arpa(["ka ga", "ka ka"], tmp_path / "c.arpa", order=2)
    lm = ArpaLM(path)
    assert ("§",) in lm._table
    assert (" ",) not in lm._table


def test_seen_ngrams_score_higher(tmp_path):
    corpus = ["kakaka" for _ in range(20)] + ["gigi"]
    path = build_char_arpa(corpus, tmp_path / "s.arpa", order=3)
    lm = ArpaLM(path)
    assert lm.score(("k",), "a") > lm.score(("k",), "i")
    assert lm.score(("k", "a"), "k") > lm.score(("g", "a"), "g")


def test_feeds_beam_search(tmp_path):
    """The built LM plugs into the decoder's shallow fusion path."""
    from ocr_inference_tpu.decode.ctc import beam_search

    charset = ["a", "b"]
    corpus = ["abab" * 5] * 10
    path = build_char_arpa(corpus, tmp_path / "b.arpa", order=3)
    lm = ArpaLM(path)
    fn = lm.make_score_fn(charset, add_blank=True)
    rng = np.random.RandomState(1)
    logits = rng.randn(12, 3).astype(np.float32)
    beams = beam_search(logits, charset, lm_score_fn=fn, top_k=3)
    assert beams and all(b.lm_score is not None for b in beams)


def test_engine_lm_rescoring_path(tmp_path):
    """A RecognitionEngine built with a KenLMConfig whose ARPA came from
    build_char_arpa runs the shallow-fusion beam path end to end (the
    bocr-selftrain LM eval wiring)."""
    import jax
    import jax.numpy as jnp

    from ocr_inference_tpu.core.data import (
        BatchConfig, CharsetEncoder, KenLMConfig, OCRModelConfig,
    )
    from ocr_inference_tpu.models import Easter2
    from ocr_inference_tpu.models.params import init_recognizer
    from ocr_inference_tpu.pipeline import RecognitionEngine

    charset = list("abcd§")
    corpus = [" ".join(["a", "b", "§", "c", "d"]) for _ in range(10)]
    arpa = build_char_arpa(corpus, tmp_path / "eng.arpa", order=3,
                           tokens=True)
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=256,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=charset, add_blank=True, version="lmtest",
    )
    rec_model = Easter2(vocab_size=len(charset) + 1, dtype=jnp.float32)
    rec_vars = init_recognizer(rec_model, 80, 256)
    rec = RecognitionEngine(
        rec_model, rec_vars, cfg,
        kenlm_config=KenLMConfig(
            kenlm_file=str(arpa), arpa_file=str(arpa), unigrams=None
        ),
        batch_cfg=BatchConfig(width_buckets=(256,), max_lines_per_batch=2),
    )
    strip = np.full((40, 180, 3), 230, np.uint8)
    strip[12:30, 15:165] = 45
    plain = rec.run_batch_beams([strip], use_lm=False, top_k=2)
    fused = rec.run_batch_beams([strip], use_lm=True, top_k=2)
    assert plain[0] and fused[0]
    assert fused[0][0].lm_score is not None
    assert plain[0][0].lm_score is None


def test_engine_lm_calibration_guard(tmp_path):
    """calibrate_lm grid-searches (alpha, beta) on labeled strips and — when
    no grid point beats the plain beam (inevitable with random weights) —
    clears lm_fusion_enabled so use_lm=True degrades to the plain beam
    (VERDICT r2 item 2: the LM-hurts-accuracy mode must be unreachable)."""
    import jax.numpy as jnp

    from ocr_inference_tpu.core.data import (
        BatchConfig, CharsetEncoder, KenLMConfig, OCRModelConfig,
    )
    from ocr_inference_tpu.models import Easter2
    from ocr_inference_tpu.models.params import init_recognizer
    from ocr_inference_tpu.pipeline import RecognitionEngine

    charset = list("abcd§")
    corpus = [" ".join(["a", "b", "§", "c", "d"]) for _ in range(10)]
    arpa = build_char_arpa(corpus, tmp_path / "cal.arpa", order=3,
                           tokens=True)
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=256,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=charset, add_blank=True, version="lmtest",
    )
    rec_model = Easter2(vocab_size=len(charset) + 1, dtype=jnp.float32)
    rec_vars = init_recognizer(rec_model, 80, 256)
    rec = RecognitionEngine(
        rec_model, rec_vars, cfg,
        kenlm_config=KenLMConfig(
            kenlm_file=str(arpa), arpa_file=str(arpa), unigrams=None
        ),
        batch_cfg=BatchConfig(width_buckets=(256,), max_lines_per_batch=4),
    )
    rng = np.random.RandomState(3)
    strips, refs = [], []
    for _ in range(3):
        s = rng.randint(200, 250, (40, 180, 3)).astype(np.uint8)
        s[12:30, 15:165] = rng.randint(20, 70, (18, 150, 3))
        strips.append(s)
        refs.append("ab cd")
    report = rec.calibrate_lm(
        strips, refs, alphas=(0.3, 0.8), betas=(0.0,)
    )
    assert "cer_beam" in report and len(report["grid"]) == 2
    assert report["enabled"] == rec.lm_fusion_enabled
    if not rec.lm_fusion_enabled:
        plain = rec.run_batch_beams(strips, use_lm=False, top_k=1)
        guarded = rec.run_batch_beams(strips, use_lm=True, top_k=1)
        assert [b[0].text for b in plain] == [b[0].text for b in guarded]
    else:
        # tuned values must be one of the grid points and beat the baseline
        assert (report["alpha"], report["beta"]) in [
            (0.3, 0.0), (0.8, 0.0)
        ]
        assert report["cer_beam_lm"] <= report["cer_beam"]
    # occupancy histogram filled by the batched forwards
    assert sum(rec.occupancy.values()) > 0
