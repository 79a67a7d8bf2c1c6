"""Vectorized batch prefix beam search vs the scalar reference
(VERDICT r1 item 8: eval-mode decode must scale to whole distributions)."""

import time

import numpy as np
import pytest

from ocr_inference_tpu.decode.ctc import beam_search
from ocr_inference_tpu.decode.ctc_batch import beam_search_batch

CHARSET = list("abcdefghij")


def _random_logits(rng, b, t, v, peaky=True):
    logits = rng.normal(size=(b, t, v)).astype(np.float64)
    if peaky:
        # realistic CTC output: strong per-frame winners (mostly blank)
        winners = rng.integers(0, v, size=(b, t))
        winners[rng.random((b, t)) < 0.6] = 0
        for bb in range(b):
            logits[bb, np.arange(t), winners[bb]] += 6.0
    return logits


@pytest.mark.parametrize("peaky", [True, False])
def test_batch_matches_scalar(peaky):
    rng = np.random.default_rng(0 if peaky else 1)
    logits = _random_logits(rng, 6, 40, len(CHARSET) + 1, peaky)
    batch = beam_search_batch(
        logits, CHARSET, add_blank=True, beam_width=16, top_k=5
    )
    for b in range(logits.shape[0]):
        scalar = beam_search(
            logits[b], CHARSET, add_blank=True, beam_width=16, top_k=5
        )
        assert batch[b][0].text == scalar[0].text
        assert batch[b][0].tokens == scalar[0].tokens
        np.testing.assert_allclose(
            batch[b][0].logit_score, scalar[0].logit_score, rtol=1e-10
        )
        # the full surviving beam set agrees as (text, score) pairs
        b_set = {(x.text, round(x.logit_score, 9)) for x in batch[b]}
        s_set = {(x.text, round(x.logit_score, 9)) for x in scalar}
        assert b_set == s_set


def test_batch_no_blank_vocab():
    rng = np.random.default_rng(2)
    logits = _random_logits(rng, 3, 25, len(CHARSET), peaky=True)
    batch = beam_search_batch(
        logits, CHARSET, add_blank=False, beam_width=8, top_k=3
    )
    for b in range(3):
        scalar = beam_search(
            logits[b], CHARSET, add_blank=False, beam_width=8, top_k=3
        )
        assert batch[b][0].text == scalar[0].text
        np.testing.assert_allclose(
            batch[b][0].logit_score, scalar[0].logit_score, rtol=1e-10
        )


def test_batch_single_line_shape():
    rng = np.random.default_rng(3)
    logits = _random_logits(rng, 1, 30, len(CHARSET) + 1)
    out2d = beam_search_batch(logits[0], CHARSET)  # (T, V) accepted
    out3d = beam_search_batch(logits, CHARSET)
    assert out2d[0][0].text == out3d[0][0].text


def test_batch_is_substantially_faster():
    rng = np.random.default_rng(4)
    logits = _random_logits(rng, 16, 120, len(CHARSET) + 1)
    t0 = time.perf_counter()
    batch = beam_search_batch(logits, CHARSET, beam_width=16, top_k=3)
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    scalar = [
        beam_search(logits[b], CHARSET, beam_width=16, top_k=3)
        for b in range(logits.shape[0])
    ]
    t_scalar = time.perf_counter() - t0
    assert [b[0].text for b in batch] == [s[0].text for s in scalar]
    # the point of the exercise: at 16 lines the batch path must win clearly
    assert t_batch < t_scalar / 2, (t_batch, t_scalar)


def test_engine_eval_mode_uses_batch_path():
    """run_batch_beams returns identical hypotheses through the batch
    decoder as the scalar per-line decode of the same logits."""
    from ocr_inference_tpu.decode.decoder import CTCDecoder

    rng = np.random.default_rng(5)
    logits = _random_logits(rng, 4, 50, len(CHARSET) + 1)
    dec = CTCDecoder(CHARSET, add_blank=True, beam_width=16)
    batch = dec.ctc_beam_decode_batch(logits, use_lm=False, top_k=4)
    for b in range(4):
        scalar = dec.ctc_beam_decode(logits[b], use_lm=False, top_k=4)
        assert batch[b][0].text == scalar[0].text
