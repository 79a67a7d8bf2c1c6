"""Evaluation: CER metric + OCR evaluator harness."""

from ocr_inference_tpu.eval.cer import CERScorer, cer, levenshtein  # noqa: F401
from ocr_inference_tpu.eval.evaluator import OCREvaluator  # noqa: F401
