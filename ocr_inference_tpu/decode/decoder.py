"""High-level CTC decoder bound to a charset, mirroring the reference's
CTCDecoder surface (reference: BDRC/inference.py:75-118): blank "<blk>" at
vocab index 0 when add_blank, charset.index+1 encode shift, greedy decode
stripping blanks, beam decode returning scored hypotheses — with the greedy
path running on device."""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Optional, Sequence

import jax
import numpy as np

from ocr_inference_tpu.core.data import KenLMConfig
from ocr_inference_tpu.decode.arpa_lm import ArpaLM
from ocr_inference_tpu.decode.ctc import Beam, beam_search, greedy_decode, ids_to_tokens


def _crosscheck_binary(binary, arpa_path: Path, n_samples: int = 32,
                       tol: float = 1e-4) -> bool:
    """Spot-check a binary LM's scores against the sibling ``.arpa``.

    A real kenlm-built ``.binary`` that parses cleanly but diverges in a
    layout detail would otherwise degrade quality silently — the parse-time
    fallback only fires on exceptions. Samples up to ``n_samples`` n-grams
    of every order straight from the ARPA table (plus one OOV and one
    backoff query) and requires score agreement to ``tol`` log10."""
    from ocr_inference_tpu.decode.arpa_lm import ArpaLM

    ref = ArpaLM(arpa_path)
    grams = list(ref._table.keys())
    stride = max(1, len(grams) // n_samples)
    probes = grams[::stride][:n_samples]
    # backoff paths: unseen high-order continuations of seen grams; OOV
    probes += [g + ("\x00unseen\x00",) for g in probes[:4]]
    probes += [("\x00oov\x00",)]
    for gram in probes:
        ctx, tok = tuple(gram[:-1]), gram[-1]
        if abs(binary.score(ctx, tok) - ref.score(ctx, tok)) > tol:
            return False
    return True


def _load_lm(kenlm_config: KenLMConfig):
    """Build the n-gram scorer for a KenLM config.

    The reference feeds pyctcdecode the ``.binary`` (inference.py:97-104)
    with the ``.arpa`` always downloaded alongside (utils.py:132-159).
    Deliberate divergence: when a readable ``.arpa`` is configured it wins
    (exact, fully validated text format) — served by the first-party C++
    scorer (native/arpa_lm.cpp) or its Python twin (``OCR_NATIVE_ARPA=0``
    forces Python). A ``.binary`` is read through decode.kenlm_binary
    (probing) or decode.kenlm_trie (trie) when it is the only artifact,
    with a fallback to the sibling ``.arpa`` if the binary fails to parse
    (e.g. quantized/array tries).
    """
    path = Path(kenlm_config.arpa_file)
    if str(path).endswith(".binary") or (
        not path.is_file() and str(kenlm_config.kenlm_file).endswith(".binary")
    ):
        from ocr_inference_tpu.decode.kenlm_trie import open_binary

        binary = path if str(path).endswith(".binary") else Path(
            kenlm_config.kenlm_file
        )
        try:
            model = open_binary(binary)  # probing or trie by model_type
            sibling = (
                path if path.is_file() and not str(path).endswith(".binary")
                else binary.with_suffix(".arpa")
            )
            if sibling.is_file() and not _crosscheck_binary(model, sibling):
                raise ValueError(
                    "binary scores diverge from the sibling .arpa"
                )
            return model
        except Exception as e:
            # fall back to the sibling .arpa the reference always downloads
            # alongside (BDRC/utils.py:132-159) — e.g. TRIE-format binaries
            # or a binary whose spot-checked scores diverge from the .arpa
            sibling = (
                path if path.is_file() and not str(path).endswith(".binary")
                else binary.with_suffix(".arpa")
            )
            if sibling.is_file():
                # stderr: bocr-serve speaks JSONL on stdout (cli/serve_cli.py)
                print(
                    f"KenLM binary unusable ({e}); using {sibling}",
                    file=sys.stderr,
                )
                path = sibling
            else:
                raise
    if os.environ.get("OCR_NATIVE_ARPA", "auto").lower() not in (
        "0", "false", "off"
    ):
        try:
            from ocr_inference_tpu.native import NativeArpaLM

            return NativeArpaLM(path)
        except Exception:
            pass  # toolchain-free hosts fall through to the Python twin
    return ArpaLM(path)


class CTCDecoder:
    """Charset-bound CTC decoder (reference: BDRC/inference.py:75-118)."""

    blank_sign = "<blk>"

    def __init__(
        self,
        charset: str | Sequence[str],
        add_blank: bool,
        kenlm_config: Optional[KenLMConfig] = None,
        beam_width: int = 64,
    ):
        self.charset = list(charset)
        self.add_blank = add_blank
        self.ctc_beam_width = beam_width
        self.ctc_vocab = self.charset.copy()
        if add_blank:
            self.ctc_vocab.insert(0, self.blank_sign)

        self._lm = None
        self._lm_score_fn = None
        self.lm_alpha = kenlm_config.alpha if kenlm_config else 0.5
        self.lm_beta = kenlm_config.beta if kenlm_config else 0.0
        if kenlm_config is not None:
            try:
                self._lm = _load_lm(kenlm_config)
                self._lm_score_fn = self._lm.make_score_fn(
                    self.charset, self.add_blank
                )
            except Exception as e:  # graceful LM fallback, like the reference
                # (reference: inference.py:102-104); stderr keeps bocr-serve's
                # stdout JSONL channel clean
                print(f"KenLM disabled: {e}", file=sys.stderr)
                self._lm = None

    @property
    def has_lm(self) -> bool:
        return self._lm is not None

    # -- label <-> id (reference: BDRC/inference.py:108-112) --

    def encode(self, label: str) -> list[int]:
        return [self.charset.index(x) + 1 for x in label]

    def decode(self, inputs: Sequence[int]) -> str:
        return "".join(self.charset[x - 1] for x in inputs)

    # -- CTC decode --

    def ctc_decode_batch(self, logits: jax.Array) -> list[str]:
        """Greedy decode a (B, T, V) device batch; logits stay on device."""
        ids, lengths, _ = greedy_decode(logits)
        ids = np.asarray(ids)
        lengths = np.asarray(lengths)
        return [
            "".join(ids_to_tokens(ids[b], int(lengths[b]), self.charset, self.add_blank))
            for b in range(ids.shape[0])
        ]

    def ctc_decode(self, logits) -> str:
        """Single-line greedy decode of (T, V) logits
        (reference: BDRC/inference.py:114-115)."""
        arr = np.asarray(logits)
        if arr.ndim == 2:
            arr = arr[None]
        return self.ctc_decode_batch(arr)[0]

    def ctc_beam_decode(
        self, logits, use_lm: bool = True, top_k: int = 10
    ) -> list[Beam]:
        """Beam decode of one line's (T, V) logits
        (reference: BDRC/inference.py:117-118)."""
        return beam_search(
            np.asarray(logits),
            self.charset,
            add_blank=self.add_blank,
            beam_width=self.ctc_beam_width,
            lm_score_fn=self._lm_score_fn if use_lm else None,
            lm_alpha=self.lm_alpha,
            lm_beta=self.lm_beta,
            top_k=top_k,
        )

    def ctc_beam_decode_batch(
        self, logits, use_lm: bool = True, top_k: int = 10
    ) -> list[list[Beam]]:
        """Beam decode a whole (B, T, V) batch.

        LM-free batches go through the vectorized search
        (decode.ctc_batch); shallow LM fusion needs a scorer call per
        candidate, so it stays on the per-line path.
        """
        arr = np.asarray(logits)
        if use_lm and self._lm_score_fn is not None:
            return [
                self.ctc_beam_decode(arr[b], use_lm=True, top_k=top_k)
                for b in range(arr.shape[0])
            ]
        from ocr_inference_tpu.decode.ctc_batch import beam_search_batch

        return beam_search_batch(
            arr,
            self.charset,
            add_blank=self.add_blank,
            beam_width=self.ctc_beam_width,
            top_k=top_k,
        )
