"""The page OCR pipeline: detection -> geometry -> dewarp -> recognition.

Mirrors the reference's OCRPipeline stage surface (reference:
BDRC/inference.py:432-826) — same stage methods, same (OpStatus, payload)
returns, same defaults — with the device work batched: one detection pass
per page, one bucketed recognition pass per page instead of per line.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import cv2
import numpy as np

from ocr_inference_tpu.core.data import (
    BatchConfig,
    CharsetEncoder,
    DewarpingResult,
    Encoding,
    KenLMConfig,
    LayoutDetectionConfig,
    Line,
    LineDetectionConfig,
    LineSorting,
    OCRLine,
    OCRModelConfig,
    OpStatus,
)
from ocr_inference_tpu.dewarp import apply_global_tps, check_for_tps
from ocr_inference_tpu.geometry import (
    build_line_data,
    build_raw_line_data,
    extract_line_images,
    filter_line_contours,
    sort_lines_by_peaks,
    sort_lines_by_threshold,
)
from ocr_inference_tpu.pipeline.engines import RecognitionEngine, SegmentationEngine
from ocr_inference_tpu.text import Converter


class PipelineObserver:
    """Stage-event protocol for observability around ``run_ocr``.

    The pipeline emits events; subscribers (audit loggers, artifact dumpers,
    progress UIs) derive whatever metadata/side effects they need from the
    raw stage payloads. This inverts the reference's design, which re-states
    the whole stage sequence inside its instrumentation wrapper
    (reference: BDRC/pipeline.py:30-195).
    """

    def stage_start(self, stage: str) -> None:  # pragma: no cover - protocol
        pass

    def stage_end(self, stage: str, payload) -> None:  # pragma: no cover
        pass

    def stage_failed(self, stage: str, error: str) -> None:  # pragma: no cover
        pass


_NULL_OBSERVER = PipelineObserver()


class OCRPipeline:
    """Page OCR pipeline over device engines.

    Construction takes pre-built engines (model + params already resolved),
    rather than ONNX file paths as the reference does — model loading is the
    loader module's job (models.params / onnx importer). The stage API and
    run_ocr contract match the reference.
    """

    def __init__(
        self,
        ocr_engine: RecognitionEngine,
        detection_engine: SegmentationEngine,
        line_config: Union[LineDetectionConfig, LayoutDetectionConfig, None] = None,
        use_line_prepadding: bool = False,
    ):
        self.ocr_inference = ocr_engine
        self.line_inference = detection_engine
        self.line_config = line_config
        self.encoder = ocr_engine.config.encoder
        self.converter = Converter()
        self.use_line_prepadding = use_line_prepadding
        self.ready = detection_engine is not None and ocr_engine is not None

    def update_ocr_model(self, engine: RecognitionEngine):
        """Swap the recognizer (reference: inference.py:465-467)."""
        self.ocr_inference = engine
        self.encoder = engine.config.encoder

    def update_line_detection(self, engine: SegmentationEngine, config=None):
        """Swap the detector (reference: inference.py:469-482)."""
        self.line_inference = engine
        self.line_config = config

    # ==================== Stage methods ====================

    def detect_lines_async(self, image: np.ndarray):
        """Stage 1, dispatched: device work is enqueued now; the returned
        zero-arg resolver blocks only on the packed-mask D2H. Lets callers
        overlap one page's detection with another's host geometry."""
        resolver = self.line_inference.predict_async(image)
        if self.line_inference.mode == "layout":
            classes = self.line_inference.classes

            def resolve():
                layout_mask = resolver()
                return OpStatus.SUCCESS, layout_mask[
                    :, :, classes.index("line")
                ]

            return resolve
        return lambda: (OpStatus.SUCCESS, resolver())

    def detect_lines(self, image: np.ndarray):
        """Stage 1: line/layout mask (reference: inference.py:488-506)."""
        return self.detect_lines_async(image)()

    def build_lines(self, image: np.ndarray, line_mask: np.ndarray):
        """Stage 2: deskew + contours (reference: inference.py:508-533)."""
        rot_img, rot_mask, line_contours, page_angle = build_raw_line_data(
            image, line_mask, rgb_mask=False
        )
        if len(line_contours) == 0:
            return OpStatus.FAILED, "No lines detected"
        filtered_contours = filter_line_contours(rot_mask, line_contours)
        if len(filtered_contours) == 0:
            return OpStatus.FAILED, "No valid lines after filtering"
        return OpStatus.SUCCESS, (
            rot_img,
            rot_mask,
            line_contours,
            filtered_contours,
            page_angle,
        )

    def apply_dewarping(
        self,
        rot_img: np.ndarray,
        rot_mask: np.ndarray,
        filtered_contours: list,
        page_angle: float,
        use_tps: bool = False,
        tps_threshold: float = 0.25,
    ):
        """Stage 3: optional TPS dewarp (reference: inference.py:535-589)."""
        if not use_tps:
            return OpStatus.SUCCESS, DewarpingResult(
                work_img=rot_img,
                work_mask=rot_mask,
                filtered_contours=filtered_contours,
                page_angle=page_angle,
                applied=False,
            )

        ratio, tps_line_data = check_for_tps(rot_img, filtered_contours)
        if ratio <= tps_threshold:
            return OpStatus.SUCCESS, DewarpingResult(
                work_img=rot_img,
                work_mask=rot_mask,
                filtered_contours=filtered_contours,
                page_angle=page_angle,
                applied=False,
                tps_ratio=ratio,
            )

        dewarped_img, dewarped_mask = apply_global_tps(
            rot_img, rot_mask, tps_line_data
        )
        if dewarped_mask.ndim == 3:
            dewarped_mask = cv2.cvtColor(
                dewarped_mask.astype(np.uint8), cv2.COLOR_RGB2GRAY
            )

        dew_rot_img, dew_rot_mask, line_contours, new_page_angle = (
            build_raw_line_data(dewarped_img, dewarped_mask, rgb_mask=False)
        )
        new_filtered = filter_line_contours(dew_rot_mask, line_contours)

        return OpStatus.SUCCESS, DewarpingResult(
            work_img=dew_rot_img,
            work_mask=dew_rot_mask,
            filtered_contours=new_filtered,
            page_angle=new_page_angle,
            applied=True,
            tps_ratio=ratio,
            dewarped_img=dewarped_img,
            dewarped_mask=dewarped_mask,
        )

    def extract_lines(
        self,
        work_img: np.ndarray,
        rot_mask: np.ndarray,
        filtered_contours: list,
        merge_lines: bool = True,
        k_factor: float = 2.5,
        bbox_tolerance: float = 4.0,
        line_sorting: LineSorting = LineSorting.THRESHOLD,
    ):
        """Stage 4: sort + crop line strips (reference: inference.py:591-616).

        ``line_sorting`` selects the reading-order algorithm: THRESHOLD is
        the reference's slice-vote sort; PEAKS is the projection-profile
        alternative the reference declares but never implements
        (geometry/lines.py sort_lines_by_peaks)."""
        line_data = [build_line_data(x) for x in filtered_contours]
        sort_fn = (
            sort_lines_by_peaks
            if line_sorting == LineSorting.PEAKS
            else sort_lines_by_threshold
        )
        sorted_lines, _ = sort_fn(
            rot_mask, line_data, group_lines=merge_lines
        )
        line_images = extract_line_images(
            work_img, sorted_lines, k_factor, bbox_tolerance
        )
        if not line_images:
            return OpStatus.FAILED, "No valid line images extracted"
        return OpStatus.SUCCESS, (sorted_lines, line_images)

    def _convert_text(self, pred: str, target_encoding: Encoding) -> str:
        if self.encoder == CharsetEncoder.WYLIE and target_encoding == Encoding.UNICODE:
            return self.converter.toUnicode(pred)
        if self.encoder == CharsetEncoder.STACK and target_encoding == Encoding.WYLIE:
            return self.converter.toWylie(pred)
        return pred

    def run_text_recognition(
        self,
        line_images: list,
        sorted_lines: list[Line],
        target_encoding: Encoding = Encoding.UNICODE,
    ):
        """Stage 5: batched recognition (reference: inference.py:618-666,
        which loops lines one by one — here it is one bucketed device pass).
        """
        keep = [
            (img, info)
            for img, info in zip(line_images, sorted_lines)
            if img.shape[0] > 0 and img.shape[1] > 0
        ]
        if not keep:
            return OpStatus.SUCCESS, []
        imgs, infos = zip(*keep)
        raw_texts = self.ocr_inference.run_batch(
            list(imgs), pre_pad=self.use_line_prepadding
        )
        ocr_lines = []
        for text, info in zip(raw_texts, infos):
            pred = text.strip().replace("§", " ")
            pred = self._convert_text(pred, target_encoding)
            ocr_lines.append(
                OCRLine(
                    guid=info.guid,
                    text=pred,
                    encoding=(
                        Encoding.WYLIE.name
                        if target_encoding == Encoding.WYLIE
                        else Encoding.UNICODE.name
                    ),
                    ctc_conf=None,
                    logits=None,
                    lm_scores=None,
                )
            )
        return OpStatus.SUCCESS, ocr_lines

    def run_text_recognition_eval(
        self,
        line_images: list,
        sorted_lines: list[Line],
        target_encoding: Encoding = Encoding.UNICODE,
        top_k_beams: int = 10,
        use_lm: bool = False,
    ):
        """Stage 5 (eval mode): beams + confidences
        (reference: inference.py:668-726)."""
        keep = [
            (img, info)
            for img, info in zip(line_images, sorted_lines)
            if img.shape[0] > 0 and img.shape[1] > 0
        ]
        if not keep:
            return OpStatus.SUCCESS, []
        imgs, infos = zip(*keep)
        all_beams = self.ocr_inference.run_batch_beams(
            list(imgs), pre_pad=self.use_line_prepadding, use_lm=use_lm,
            top_k=top_k_beams,
        )
        ocr_lines = []
        for beams, info in zip(all_beams, infos):
            if not beams:
                continue
            beams = beams[:top_k_beams]
            pred = beams[0].text.strip().replace(" ", "")
            pred = pred.replace("§", " ")
            pred = self._convert_text(pred, target_encoding)
            # length-normalized confidence (reference: inference.py:707-720)
            length = max(len(beams[0].text), 1)
            norm_logp = beams[0].logit_score / length
            ocr_lines.append(
                OCRLine(
                    guid=info.guid,
                    text=pred,
                    encoding=(
                        Encoding.WYLIE.name
                        if target_encoding == Encoding.WYLIE
                        else Encoding.UNICODE.name
                    ),
                    ctc_conf=float(math.exp(norm_logp)),
                    logits=[float(b.logit_score) for b in beams],
                    lm_scores=(
                        [float(b.lm_score) for b in beams]
                        if beams[0].lm_score is not None
                        else None
                    ),
                )
            )
        return OpStatus.SUCCESS, ocr_lines

    # ==================== Main entry ====================

    def run_ocr(
        self,
        image: np.ndarray,
        k_factor: float = 2.5,
        bbox_tolerance: float = 4.0,
        merge_lines: bool = True,
        use_tps: bool = False,
        tps_threshold: float = 0.25,
        target_encoding: Encoding = Encoding.UNICODE,
        eval_mode: bool = False,
        observer: Optional[PipelineObserver] = None,
        line_sorting: LineSorting = LineSorting.THRESHOLD,
    ):
        """Full page OCR (reference: inference.py:732-826): stages 1-5 with
        per-stage failure isolation; SUCCESS payload is
        [rot_mask, sorted_lines, ocr_lines, page_angle]. ``observer``
        receives stage start/end/failed events with the raw payloads."""
        obs = observer or _NULL_OBSERVER

        def run_stage(stage: str, error_prefix: str, fn, *args, **kwargs):
            """One stage with failure isolation + observer events; returns
            (ok, payload) where payload is the error string when not ok."""
            obs.stage_start(stage)
            try:
                status, result = fn(*args, **kwargs)
            except Exception as e:
                msg = f"{error_prefix}: {str(e)}"
                obs.stage_failed(stage, msg)
                return False, msg
            if status == OpStatus.FAILED:
                obs.stage_failed(stage, str(result))
                return False, result
            obs.stage_end(stage, result)
            return True, result

        try:
            if not self.ready:
                return OpStatus.FAILED, "OCR pipeline not ready"
            if image is None:
                return OpStatus.FAILED, "Input image is None"

            ok, result = run_stage(
                "line_detection", "Line detection failed",
                self.detect_lines, image,
            )
            if not ok:
                return OpStatus.FAILED, result
            line_mask = result

            ok, result = run_stage(
                "build_line_data", "Line data building failed",
                self.build_lines, image, line_mask,
            )
            if not ok:
                return OpStatus.FAILED, result
            rot_img, rot_mask, _, filtered_contours, page_angle = result

            ok, result = run_stage(
                "dewarping", "Line processing failed",
                self.apply_dewarping, rot_img, rot_mask, filtered_contours,
                page_angle, use_tps=use_tps, tps_threshold=tps_threshold,
            )
            if not ok:
                return OpStatus.FAILED, result
            dewarp_result = result

            ok, result = run_stage(
                "extract_lines", "Line extraction failed",
                self.extract_lines, dewarp_result.work_img, rot_mask,
                dewarp_result.filtered_contours, merge_lines=merge_lines,
                k_factor=k_factor, bbox_tolerance=bbox_tolerance,
                line_sorting=line_sorting,
            )
            if not ok:
                return OpStatus.FAILED, result
            sorted_lines, line_images = result

            recognize = (
                self.run_text_recognition_eval
                if eval_mode
                else self.run_text_recognition
            )
            ok, ocr_lines = run_stage(
                "ocr_inference", "OCR processing failed",
                recognize, line_images, sorted_lines,
                target_encoding=target_encoding,
            )
            if not ok:
                return OpStatus.FAILED, ocr_lines

            return OpStatus.SUCCESS, [
                rot_mask,
                sorted_lines,
                ocr_lines,
                float(page_angle),
            ]
        except Exception as e:
            return OpStatus.FAILED, f"OCR pipeline failed: {str(e)}"
