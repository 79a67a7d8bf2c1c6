"""CER evaluation harness (reference: OCREvaluator, BDRC/inference.py:964).

Same surface — config path + scorer + optional KenLM + label encoding —
with a batched fast path: ``evaluate_distribution`` pushes every line image
of a distribution through the bucketed recognition engine in device batches
instead of one ONNX call per line.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from ocr_inference_tpu.core.assets import get_filename, read_ocr_model_config
from ocr_inference_tpu.core.data import (
    CharsetEncoder,
    Encoding,
    EvaluationSet,
    KenLMConfig,
)
from ocr_inference_tpu.eval.cer import CERScorer
from ocr_inference_tpu.ops_host import binarize_host
from ocr_inference_tpu.pipeline.builder import build_recognition_engine
from ocr_inference_tpu.text import StackEncoder, WylieEncoder


class OCREvaluator:
    """Run OCR inference + CER on line-image/label pairs."""

    def __init__(
        self,
        config_path: str,
        cer_scorer=None,
        kenlm_config: Optional[KenLMConfig] = None,
        label_encoding: Encoding = Encoding.UNICODE,
        allow_random: bool = False,
    ):
        assert os.path.isfile(config_path)
        self._config_file = config_path
        self._cer_scorer = cer_scorer or CERScorer()
        self._kenlm_config = kenlm_config
        self._label_encoding = label_encoding
        self._model_config = read_ocr_model_config(config_path)
        if self._model_config.encoder == CharsetEncoder.STACK:
            self._label_encoder = StackEncoder(self._model_config.charset)
        else:
            self._label_encoder = WylieEncoder(self._model_config.charset)
        self._inference = build_recognition_engine(
            self._model_config, kenlm_config, allow_random=allow_random
        )

    def get_architecture(self) -> str:
        return self._model_config.architecture

    def _read_label(self, label_path: str) -> str:
        label = self._label_encoder.read_label(label_path)
        if isinstance(label, list):  # stack encoder returns stack list
            label = "".join(label)
        return label

    def evaluate(self, image_path: str, label_path: str) -> float:
        """One image/label pair -> CER (reference: inference.py:1002-1011)."""
        img = cv2.imread(image_path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        label = self._read_label(label_path)
        prediction = self._inference.run(img)
        return self._cer_scorer.compute(
            predictions=[prediction], references=[label]
        )

    def evaluate_distribution(
        self,
        folder_name: str,
        image_paths: list[str],
        label_paths: list[str],
        batch_binarize: bool = True,
    ) -> EvaluationSet:
        """Folder-level evaluation (reference: inference.py:1013-1040), with
        the recognizer running in device batches across all lines."""
        images = []
        names = []
        labels = []
        for image_path, label_path in zip(image_paths, label_paths):
            img = cv2.imread(image_path)
            if img is None:
                continue
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if batch_binarize:
                img = binarize_host(img)
            images.append(img)
            names.append(get_filename(image_path))
            labels.append(self._read_label(label_path))

        predictions = self._inference.run_batch(images)
        cer_scores = {
            name: float(
                self._cer_scorer.compute(predictions=[pred], references=[label])
            )
            for name, pred, label in zip(names, predictions, labels)
        }
        return EvaluationSet(folder_name, image_paths, label_paths, cer_scores)
