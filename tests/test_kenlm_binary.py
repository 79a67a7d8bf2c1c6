"""KenLM .binary probing-format reader/converter (VERDICT r1 item 9)."""

from pathlib import Path

import numpy as np
import pytest

from ocr_inference_tpu.decode.arpa_lm import ArpaLM
from ocr_inference_tpu.decode.kenlm_binary import (
    KenLMBinary,
    arpa_to_binary,
    combine_word_hash,
    murmur64a,
)

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-1.0\t<unk>\t0.0
-0.5\ta\t-0.3
-0.7\tb\t-0.2
-0.9\tc\t-0.1
-1.2\td\t0.0

\\2-grams:
-0.4\ta b\t-0.25
-0.6\tb c\t-0.15
-0.8\tc a\t0.0
-1.1\ta d\t0.0

\\3-grams:
-0.3\ta b c
-0.5\tb c a

\\end\\
"""


@pytest.fixture
def lm_pair(tmp_path):
    arpa = tmp_path / "model.arpa"
    arpa.write_text(ARPA)
    binary = tmp_path / "model.binary"
    arpa_to_binary(arpa, binary)
    return ArpaLM(arpa), KenLMBinary(binary), arpa, binary


def test_murmur_reference_vectors():
    # MurmurHash64A with seed 0 — stable across runs and platforms
    assert murmur64a(b"") == 0
    assert murmur64a(b"a") == murmur64a(b"a")
    assert murmur64a(b"a") != murmur64a(b"b")
    assert murmur64a(b"abcdefgh") != murmur64a(b"abcdefg")
    # 64-bit range
    assert 0 <= murmur64a(b"tibetan") < (1 << 64)
    assert 0 <= combine_word_hash(12345, 7) < (1 << 64)


def test_binary_scores_match_arpa(lm_pair):
    arpa, binary, _, _ = lm_pair
    cases = [
        ((), "a"),
        ((), "<unk>"),
        (("a",), "b"),
        (("a", "b"), "c"),         # full trigram hit
        (("b", "c"), "a"),
        (("c",), "a"),
        (("d",), "a"),             # backoff through d
        (("a", "d"), "b"),         # backoff chain
        (("b", "a"), "d"),
        ((), "zzz"),               # OOV -> <unk>
        (("zzz",), "a"),           # OOV context
    ]
    for ctx, tok in cases:
        np.testing.assert_allclose(
            binary.score(ctx, tok), arpa.score(ctx, tok), rtol=1e-6,
            err_msg=f"ctx={ctx} tok={tok}",
        )


def test_binary_vocab_roundtrip(lm_pair):
    _, binary, _, _ = lm_pair
    assert binary.order == 3
    assert binary.counts == [5, 4, 2]
    assert binary.token_id("<unk>") == 0
    ids = {binary.token_id(t) for t in ["a", "b", "c", "d"]}
    assert len(ids) == 4 and 0 not in ids
    assert binary.token_id("nope") == 0


def test_binary_hash_vocab_lookup(lm_pair, tmp_path):
    """Lookup through the murmur probing table (no trailing strings)."""
    _, _, arpa, _ = lm_pair
    binary2 = tmp_path / "m2.binary"
    arpa_to_binary(arpa, binary2)
    lm = KenLMBinary(binary2)
    lm._word_ids = {}  # force the hash-table path
    assert lm.token_id("a") == KenLMBinary(binary2).token_id("a")
    assert lm.token_id("missing-word") == 0


def test_binary_make_score_fn_matches_arpa(lm_pair):
    arpa, binary, _, _ = lm_pair
    charset = ["a", "b", "c", "d"]
    f_a = arpa.make_score_fn(charset, add_blank=True)
    f_b = binary.make_score_fn(charset, add_blank=True)
    np.testing.assert_allclose(f_b((1, 2), 3), f_a((1, 2), 3), rtol=1e-6)
    np.testing.assert_allclose(f_b((), 1), f_a((), 1), rtol=1e-6)


def test_bad_magic_rejected(tmp_path):
    bad = tmp_path / "bad.binary"
    bad.write_bytes(b"not a kenlm file" + b"\x00" * 256)
    with pytest.raises(ValueError, match="bad magic"):
        KenLMBinary(bad)


def test_trie_model_type_rejected(tmp_path, lm_pair):
    _, _, _, binary = lm_pair
    raw = bytearray(Path(binary).read_bytes())
    import struct

    struct.pack_into("<i", raw, 88 + 8, 2)  # model_type = TRIE
    trie = tmp_path / "trie.binary"
    trie.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="PROBING"):
        KenLMBinary(trie)


def test_decoder_loads_binary_config(lm_pair):
    from ocr_inference_tpu.core.data import KenLMConfig
    from ocr_inference_tpu.decode.decoder import CTCDecoder

    arpa, _, arpa_path, binary_path = lm_pair
    cfg = KenLMConfig(
        kenlm_file=str(binary_path), arpa_file=str(binary_path),
        unigrams=["a", "b", "c", "d"],
    )
    dec = CTCDecoder(["a", "b", "c", "d"], add_blank=True, kenlm_config=cfg)
    assert dec.has_lm
    np.testing.assert_allclose(
        dec._lm.score(("a",), "b"), arpa.score(("a",), "b"), rtol=1e-6
    )


def test_decoder_falls_back_to_sibling_arpa(tmp_path, lm_pair):
    from ocr_inference_tpu.core.data import KenLMConfig
    from ocr_inference_tpu.decode.decoder import CTCDecoder

    _, _, arpa_path, _ = lm_pair
    corrupt = tmp_path / "corrupt.binary"
    corrupt.write_bytes(b"\x00" * 512)
    cfg = KenLMConfig(
        kenlm_file=str(corrupt), arpa_file=str(arpa_path), unigrams=None
    )
    dec = CTCDecoder(["a", "b", "c", "d"], add_blank=True, kenlm_config=cfg)
    assert dec.has_lm  # sibling .arpa carried the load
