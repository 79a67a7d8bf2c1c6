"""Character error rate, self-contained (replaces HF evaluate's "cer").

The reference injects huggingface evaluate.load("cer") into its evaluator
(reference: BDRC/inference.py:964-1011, OCR-CrossEvaluation notebook cell 8).
This implementation matches that metric's definition: corpus-level
Levenshtein distance over characters divided by total reference length.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Edit distance (substitution/insert/delete, all cost 1)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    # two-row DP over the shorter string for memory locality
    if len(b) > len(a):
        a, b = b, a
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, start=1):
        curr = np.empty(len(b) + 1, dtype=np.int64)
        curr[0] = i
        for j, cb in enumerate(b, start=1):
            curr[j] = min(
                prev[j] + 1,        # deletion
                curr[j - 1] + 1,    # insertion
                prev[j - 1] + (ca != cb),  # substitution
            )
        prev = curr
    return int(prev[-1])


class CERScorer:
    """HF-evaluate-compatible surface: compute(predictions, references)."""

    def compute(
        self,
        predictions: Sequence[str],
        references: Sequence[str],
    ) -> float:
        if len(predictions) != len(references):
            raise ValueError("predictions and references length mismatch")
        total_dist = 0
        total_len = 0
        for pred, ref in zip(predictions, references):
            total_dist += levenshtein(pred, ref)
            total_len += len(ref)
        if total_len == 0:
            return 0.0 if total_dist == 0 else float(total_dist)
        return total_dist / total_len


def cer(predictions: Sequence[str], references: Sequence[str]) -> float:
    return CERScorer().compute(predictions, references)
