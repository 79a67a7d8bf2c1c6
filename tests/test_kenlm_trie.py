"""KenLM .binary TRIE reader/converter + randomized property suite for
BOTH binary readers vs the ARPA scorer (VERDICT r1 item 7)."""

import struct

import numpy as np
import pytest

from ocr_inference_tpu.decode.arpa_lm import ArpaLM
from ocr_inference_tpu.decode.kenlm_binary import (
    _PARAMS_SIZE,
    _SANITY_SIZE,
    KenLMBinary,
    arpa_to_binary,
)
from ocr_inference_tpu.decode.kenlm_trie import (
    KenLMTrie,
    arpa_to_trie,
    open_binary,
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
def trie_pair(tmp_path):
    arpa = tmp_path / "model.arpa"
    arpa.write_text(ARPA)
    binary = tmp_path / "model.trie.binary"
    arpa_to_trie(arpa, binary)
    return ArpaLM(arpa), KenLMTrie(binary), arpa, binary


def test_trie_scores_match_arpa(trie_pair):
    arpa, trie, _, _ = trie_pair
    cases = [
        ((), "a"),
        ((), "<unk>"),
        (("a",), "b"),
        (("a", "b"), "c"),          # full trigram hit
        (("b", "c"), "a"),
        (("c",), "a"),
        (("d",), "a"),              # backoff through d
        (("a", "d"), "b"),          # backoff chain
        (("b", "a"), "d"),
        ((), "zzz"),                # OOV -> <unk>
        (("c", "a"), "d"),          # backoff with context backoff weight
    ]
    for ctx, tok in cases:
        np.testing.assert_allclose(
            trie.score(ctx, tok), arpa.score(ctx, tok), rtol=1e-6,
            atol=1e-7, err_msg=f"ctx={ctx} tok={tok}",
        )


def test_trie_vocab_and_counts(trie_pair):
    _, trie, _, _ = trie_pair
    assert trie.order == 3
    assert trie.counts[0] == 5
    assert trie.token_id("<unk>") == 0
    ids = {trie.token_id(t) for t in ["a", "b", "c", "d"]}
    assert len(ids) == 4 and 0 not in ids
    assert trie.token_id("nope") == 0


def test_trie_sorted_hash_vocab_lookup(trie_pair):
    """Lookup through the sorted-hash array (no trailing strings)."""
    _, trie, _, _ = trie_pair
    by_strings = {t: trie.token_id(t) for t in ["a", "b", "c", "d", "zz"]}
    trie._word_ids = {}  # force the binary-search path
    for t, want in by_strings.items():
        assert trie.token_id(t) == want


def test_open_binary_dispatch(tmp_path):
    arpa = tmp_path / "m.arpa"
    arpa.write_text(ARPA)
    probing = tmp_path / "m.probing.binary"
    trie = tmp_path / "m.trie.binary"
    arpa_to_binary(arpa, probing)
    arpa_to_trie(arpa, trie)
    assert isinstance(open_binary(probing), KenLMBinary)
    assert isinstance(open_binary(trie), KenLMTrie)
    # quantized trie (model_type 3) -> clear rejection
    blob = bytearray(trie.read_bytes())
    struct.pack_into("<i", blob, _SANITY_SIZE + 8, 3)
    quant = tmp_path / "m.quant.binary"
    quant.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="unsupported"):
        open_binary(quant)
    with pytest.raises(ValueError, match="bad magic"):
        open_binary(arpa)


def test_trie_make_score_fn_matches_arpa(trie_pair):
    arpa, trie, _, _ = trie_pair
    charset = ["a", "b", "c", "d"]
    f_a = arpa.make_score_fn(charset, add_blank=True)
    f_t = trie.make_score_fn(charset, add_blank=True)
    np.testing.assert_allclose(f_t((1, 2), 3), f_a((1, 2), 3), rtol=1e-6)
    np.testing.assert_allclose(f_t((), 1), f_a((), 1), rtol=1e-6)


# ---------------------------------------------------------------------------
# Randomized property suite: both binary readers == ARPA scorer
# ---------------------------------------------------------------------------

def _random_arpa(rng: np.random.RandomState, order: int, n_vocab: int) -> str:
    """A structurally valid random ARPA: full unigram coverage (incl.
    <s>/</s>/<unk>), random higher-order subsets WITHOUT closure (the trie
    writer must bridge missing reversed prefixes with blanks), random
    probs/backoffs, some entries with omitted backoff fields."""
    words = [f"w{i}" for i in range(n_vocab)] + ["<s>", "</s>"]
    grams: list[dict] = [{} for _ in range(order + 1)]
    for w in ["<unk>"] + words:
        grams[1][(w,)] = (
            round(float(-rng.uniform(0.1, 3.0)), 4),
            round(float(-rng.uniform(0.0, 1.0)), 4) if rng.rand() < 0.8
            else None,
        )
    # higher orders: random tuples over the real words (no <unk>: kenlm
    # maps unknown strings to id 0, ArpaLM keys strings — equality only
    # holds when <unk> carries no higher-order entries)
    for k in range(2, order + 1):
        n = int(rng.randint(max(n_vocab, 4), 4 * n_vocab))
        for _ in range(n):
            gram = tuple(
                words[rng.randint(len(words))] for _ in range(k)
            )
            backoff = (
                round(float(-rng.uniform(0.0, 1.0)), 4)
                if k < order and rng.rand() < 0.7 else None
            )
            grams[k][gram] = (round(float(-rng.uniform(0.1, 4.0)), 4),
                              backoff)
    lines = ["\\data\\"]
    for k in range(1, order + 1):
        lines.append(f"ngram {k}={len(grams[k])}")
    for k in range(1, order + 1):
        lines.append("")
        lines.append(f"\\{k}-grams:")
        for gram, (p, b) in grams[k].items():
            row = f"{p}\t{' '.join(gram)}"
            if b is not None:
                row += f"\t{b}"
            lines.append(row)
    lines += ["", "\\end\\", ""]
    return "\n".join(lines)


@pytest.mark.parametrize("order,n_vocab,seed", [
    (2, 8, 0), (3, 10, 1), (4, 12, 2), (5, 9, 3), (3, 25, 4),
])
def test_random_arpa_equality_both_readers(tmp_path, order, n_vocab, seed):
    """Randomized ARPAs across orders: probing AND trie scores must equal
    the ARPA scorer's to 1e-4 on random contexts, including unknown words
    and cross-sentence (<s>/</s>) contexts (VERDICT r1 item 7)."""
    rng = np.random.RandomState(seed)
    arpa_path = tmp_path / "r.arpa"
    arpa_path.write_text(_random_arpa(rng, order, n_vocab))
    arpa = ArpaLM(arpa_path)

    probing_path = tmp_path / "r.probing.binary"
    trie_path = tmp_path / "r.trie.binary"
    arpa_to_binary(arpa_path, probing_path)
    arpa_to_trie(arpa_path, trie_path)
    probing = KenLMBinary(probing_path)
    trie = KenLMTrie(trie_path)

    probes = [f"w{i}" for i in range(n_vocab)] + [
        "<s>", "</s>", "zzz-oov", "another-oov"
    ]
    for _ in range(400):
        clen = int(rng.randint(0, order + 2))  # incl. > order contexts
        ctx = tuple(probes[rng.randint(len(probes))] for _ in range(clen))
        tok = probes[rng.randint(len(probes))]
        want = arpa.score(ctx, tok)
        got_p = probing.score(ctx, tok)
        got_t = trie.score(ctx, tok)
        assert abs(got_p - want) < 1e-4, f"probing ctx={ctx} tok={tok}"
        assert abs(got_t - want) < 1e-4, f"trie ctx={ctx} tok={tok}"


def test_trie_blank_nodes_bridge_missing_prefixes(tmp_path):
    """A trigram whose reversed prefix bigram is NOT in the ARPA must
    still be reachable (blank-node insertion), and the blank node itself
    must not score as a hit."""
    arpa = tmp_path / "b.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=3\nngram 2=1\nngram 3=1\n\n"
        "\\1-grams:\n-1.0\t<unk>\t0.0\n-0.5\tx\t-0.3\n-0.7\ty\t-0.2\n\n"
        "\\2-grams:\n-0.4\tx y\t-0.25\n\n"
        # reversed prefix of (x y x) is (x, y) = bigram "y x": NOT present
        "\\3-grams:\n-0.3\tx y x\n\n\\end\\\n"
    )
    ref = ArpaLM(arpa)
    out = tmp_path / "b.binary"
    arpa_to_trie(arpa, out)
    trie = KenLMTrie(out)
    # full trigram reachable through the blank "y x" node
    np.testing.assert_allclose(
        trie.score(("x", "y"), "x"), ref.score(("x", "y"), "x"), rtol=1e-6
    )
    # the blank bigram "y x" itself must backoff like a miss
    np.testing.assert_allclose(
        trie.score(("y",), "x"), ref.score(("y",), "x"), rtol=1e-6
    )
