"""Page OCR pipeline: device engines + stage orchestration."""

from ocr_inference_tpu.pipeline.engines import (  # noqa: F401
    RecognitionEngine,
    SegmentationEngine,
    pad_ocr_line_host,
)
from ocr_inference_tpu.pipeline.ocr_pipeline import OCRPipeline  # noqa: F401
from ocr_inference_tpu.pipeline.modern_layout import (  # noqa: F401
    ModernBookFormatLayoutDetection,
)
from ocr_inference_tpu.pipeline.runner import run_ocr_with_artifacts  # noqa: F401
from ocr_inference_tpu.pipeline.volume import PageRecord, VolumeRunner  # noqa: F401
