"""CTC decode tests: greedy collapse correctness, beam search, LM fusion."""

import numpy as np
import pytest

from ocr_inference_tpu.decode import ArpaLM, CTCDecoder, beam_search, greedy_decode


def _logits_from_ids(ids, vocab, peak=10.0):
    """Build peaky logits that argmax-decode to the given frame ids."""
    t = len(ids)
    logits = np.zeros((t, vocab), dtype=np.float32)
    for i, v in enumerate(ids):
        logits[i, v] = peak
    return logits


def test_greedy_collapse_rules():
    # frames: blank a a blank b b b blank a -> "a b a" (ids 1, 2, 1)
    frames = [0, 1, 1, 0, 2, 2, 2, 0, 1]
    logits = _logits_from_ids(frames, 4)[None]
    ids, lengths, conf = greedy_decode(logits)
    assert int(lengths[0]) == 3
    assert list(np.asarray(ids[0][:3])) == [1, 2, 1]
    assert np.asarray(conf)[0] < 0.0  # log prob


def test_greedy_batch_padding():
    a = _logits_from_ids([0, 1, 0], 4)
    b = _logits_from_ids([2, 2, 3], 4)
    ids, lengths, _ = greedy_decode(np.stack([a, b]))
    assert list(np.asarray(lengths)) == [1, 2]
    assert list(np.asarray(ids[1][:2])) == [2, 3]
    assert int(ids[0][1]) == -1  # padded


def test_decoder_roundtrip_and_blank_shift():
    dec = CTCDecoder(charset=list("abc"), add_blank=True)
    assert dec.ctc_vocab[0] == "<blk>"
    assert dec.encode("cab") == [3, 1, 2]
    assert dec.decode([3, 1, 2]) == "cab"


def test_decoder_greedy_text():
    dec = CTCDecoder(charset=list("ab"), add_blank=True)
    frames = [0, 1, 1, 0, 2, 0, 1]
    logits = _logits_from_ids(frames, 3)
    assert dec.ctc_decode(logits) == "aba"


def test_beam_search_matches_greedy_on_peaky_logits():
    charset = list("abcd")
    dec = CTCDecoder(charset=charset, add_blank=True)
    rng = np.random.default_rng(7)
    for _ in range(5):
        frames = rng.integers(0, 5, size=20)
        logits = _logits_from_ids(frames, 5, peak=12.0)
        greedy = dec.ctc_decode(logits)
        beams = dec.ctc_beam_decode(logits)
        assert beams[0].text == greedy
        # scores sorted descending
        scores = [b.logit_score for b in beams]
        assert scores == sorted(scores, reverse=True)


def test_beam_search_sums_paths():
    # Classic case where best-path and best-label differ:
    # p(frame1) = [.6 blank, .4 'a'], p(frame2) = [.6 blank, .4 'a']
    # best path = blank,blank -> "" (0.36) but P("a") = .4*.6+.6*.4+.4*.4 = .64
    logits = np.log(np.array([[0.6, 0.4], [0.6, 0.4]], dtype=np.float64))
    beams = beam_search(logits, charset=["a"], add_blank=True, beam_width=8)
    assert beams[0].text == "a"
    np.testing.assert_allclose(np.exp(beams[0].logit_score), 0.64, atol=1e-6)


def _toy_arpa(tmp_path):
    arpa = "\n".join(
        [
            "\\data\\",
            "ngram 1=4",
            "ngram 2=2",
            "",
            "\\1-grams:",
            "-0.5\ta\t-0.3",
            "-1.0\tb\t-0.2",
            "-2.0\tc",
            "-3.0\t<unk>",
            "",
            "\\2-grams:",
            "-0.1\ta b",
            "-2.5\ta c",
            "",
            "\\end\\",
        ]
    )
    p = tmp_path / "toy.arpa"
    p.write_text(arpa, encoding="utf-8")
    return p


def test_arpa_lm_scoring(tmp_path):
    lm = ArpaLM(_toy_arpa(tmp_path))
    assert lm.order == 2
    assert lm.score((), "a") == pytest.approx(-0.5)
    assert lm.score(("a",), "b") == pytest.approx(-0.1)
    # backoff: P(c | b) = backoff(b) + P(c) = -0.2 + -2.0
    assert lm.score(("b",), "c") == pytest.approx(-2.2)
    # OOV -> <unk>
    assert lm.score((), "zzz") == pytest.approx(-3.0)


def test_beam_search_with_lm_prefers_likely_sequence(tmp_path):
    lm = ArpaLM(_toy_arpa(tmp_path))
    charset = ["a", "b", "c"]
    score_fn = lm.make_score_fn(charset, add_blank=True)
    # acoustically ambiguous between "ab" and "ac"
    logits = np.log(
        np.array(
            [[0.02, 0.96, 0.01, 0.01], [0.02, 0.01, 0.485, 0.485]],
            dtype=np.float64,
        )
    )
    no_lm = beam_search(logits, charset, add_blank=True)
    with_lm = beam_search(
        logits, charset, add_blank=True, lm_score_fn=score_fn, lm_alpha=0.8
    )
    assert with_lm[0].text == "ab"  # LM strongly prefers a->b
    assert with_lm[0].lm_score is not None


def test_kenlm_config_alpha_threads_into_beams(tmp_path):
    """KenLMConfig.alpha/beta flow into the fused beam scores: alpha=0,
    beta=0 with an LM attached must reproduce the LM-free ranking, and a
    strong alpha must flip the acoustically ambiguous choice."""
    from ocr_inference_tpu.core.data import KenLMConfig

    arpa = _toy_arpa(tmp_path)
    charset = ["a", "b", "c"]
    logits = np.log(
        np.array(
            [[0.02, 0.96, 0.01, 0.01], [0.02, 0.01, 0.48, 0.49]],
            dtype=np.float64,
        )
    )
    plain = CTCDecoder(charset, add_blank=True).ctc_beam_decode(logits)

    cfg0 = KenLMConfig(kenlm_file=arpa, arpa_file=arpa, unigrams=None,
                       alpha=0.0, beta=0.0)
    dec0 = CTCDecoder(charset, add_blank=True, kenlm_config=cfg0)
    assert dec0.lm_alpha == 0.0
    neutral = dec0.ctc_beam_decode(logits, use_lm=True)
    assert [b.text for b in neutral] == [b.text for b in plain]
    assert neutral[0].logit_score == pytest.approx(plain[0].logit_score)

    cfg = KenLMConfig(kenlm_file=arpa, arpa_file=arpa, unigrams=None,
                      alpha=0.8)
    dec = CTCDecoder(charset, add_blank=True, kenlm_config=cfg)
    fused = dec.ctc_beam_decode(logits, use_lm=True)
    assert plain[0].text == "ac"  # acoustics alone pick c
    assert fused[0].text == "ab"  # LM (P(b|a)=-0.1) flips it


def test_decoder_from_kenlm_config(tmp_path):
    from ocr_inference_tpu.core.data import KenLMConfig

    arpa = _toy_arpa(tmp_path)
    cfg = KenLMConfig(kenlm_file=arpa, arpa_file=arpa, unigrams=["a", "b", "c"])
    dec = CTCDecoder(charset=["a", "b", "c"], add_blank=True, kenlm_config=cfg)
    assert dec.has_lm
    # bad path falls back gracefully (reference: inference.py:102-104)
    cfg_bad = KenLMConfig(kenlm_file="/nope", arpa_file="/nope", unigrams=None)
    dec2 = CTCDecoder(charset=["a"], add_blank=True, kenlm_config=cfg_bad)
    assert not dec2.has_lm


def test_greedy_decode_packed_round_trip():
    from ocr_inference_tpu.decode.ctc import (
        greedy_decode_packed,
        unpack_greedy_host,
    )

    rng = np.random.default_rng(9)
    logits = rng.normal(size=(4, 20, 7)).astype(np.float32)
    ids, lengths, conf = greedy_decode(logits)
    p_ids, p_lengths, p_conf = unpack_greedy_host(
        np.asarray(greedy_decode_packed(logits))
    )
    assert (np.asarray(ids) == p_ids).all()
    assert (np.asarray(lengths) == p_lengths).all()
    np.testing.assert_allclose(np.asarray(conf), p_conf, rtol=0, atol=0)
