"""Flax model zoo: segmentation (UNet, DeepLabV3+) and recognition
(Easter2 family, CRNN)."""

from ocr_inference_tpu.models.recognition import (  # noqa: F401
    CRNN,
    Easter2,
    build_recognizer,
)
from ocr_inference_tpu.models.segmentation import (  # noqa: F401
    DeepLabV3Plus,
    UNet,
)
