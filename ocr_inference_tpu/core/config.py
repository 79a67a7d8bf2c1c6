"""Static registry + string<->enum maps + arrow schemas.

Parity with the reference registry (reference: Config.py:18-115) so the same
HuggingFace model repos, CLI flag spellings, and parquet schemas work
unchanged.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_inference_tpu.core.data import (
    CharsetEncoder,
    Encoding,
    ExportFormat,
    Language,
    LineMerge,
    LineMode,
    LineSorting,
    OCRArchitecture,
    TPSMode,
)

# HuggingFace model registry (reference: Config.py:18-30)
MODEL_DICT = {
    "Lines_v2": "BDRC/PhotiLines_v2",
    "Photi_v2": "BDRC/Photi-v2",
    "Woodblock": "BDRC/Woodblock",
    "UCHAN": "BDRC/BigUCHAN_v1",
    "DergeTenjur": "BDRC/DergeTenjur",
    "GoogleBooks_C": "BDRC/GoogleBooks_C_v1",
    "GoogleBooks_E": "BDRC/GoogleBooks_E_v1",
    "Norbuketaka_C": "BDRC/Norbuketaka_C_V1",
    "Norbuketaka_E": "BDRC/Norbuketaka_E_V1",
    "Drutsa-A_E": "BDRC/Drutsa-A_E_v1",
    "ModernBooks": "BDRC/ModernBookFormat",
}

# Layout class overlay colors (reference: Config.py:37-48)
COLOR_DICT = {
    "background": "0, 0, 0",
    "image": "45, 255, 0",
    "text": "255, 243, 0",
    "margin": "0, 0, 255",
    "caption": "255, 100, 243",
    "table": "0, 255, 0",
    "pagenr": "0, 100, 15",
    "header": "255, 0, 0",
    "footer": "255, 255, 100",
    "line": "0, 100, 255",
}

LANGUAGES = {
    "en": Language.ENGLISH,
    "de": Language.GERMAN,
    "fr": Language.FRENCH,
    "bo": Language.TIBETAN,
    "ch": Language.CHINESE,
}

ENCODINGS = {"unicode": Encoding.UNICODE, "wylie": Encoding.WYLIE}

CHARSETENCODER = {"wylie": CharsetEncoder.WYLIE, "stack": CharsetEncoder.STACK}

# Architecture name -> family (reference: Config.py:71-77)
OCR_ARCHITECTURES = {
    "Easter2": OCRArchitecture.EASTER2,
    "Easter2b": OCRArchitecture.EASTER2,
    "Easter2-Vit": OCRArchitecture.EASTER2,
    "Easter2-Attention": OCRArchitecture.EASTER2,
    "CRNN": OCRArchitecture.CRNN,
}

EXPORTERS = {
    "xml": ExportFormat.XML,
    "json": ExportFormat.JSON,
    "text": ExportFormat.TXT,
}

LINE_MODES = {"line": LineMode.LINE, "layout": LineMode.LAYOUT}

LINE_MERGE = {"merge": LineMerge.MERGE, "stack": LineMerge.STACK}

LINE_SORTING = {"threshold": LineSorting.THRESHOLD, "peaks": LineSorting.PEAKS}

TPS_MODE = {"local": TPSMode.LOCAL, "global": TPSMode.GLOBAL}

# Parquet schema for detection-only runs (reference: Config.py:90-115)
LINE_DETECTION_SCHEMA = pa.schema(
    [
        ("image_name", pa.string()),
        ("image_width", pa.int32()),
        ("image_height", pa.int32()),
        ("num_contours", pa.int32()),
        (
            "contours",
            pa.list_(
                pa.list_(
                    pa.struct([("x", pa.int32()), ("y", pa.int32())])
                )
            ),
        ),
        (
            "bboxes",
            pa.list_(
                pa.struct(
                    [
                        ("x", pa.int32()),
                        ("y", pa.int32()),
                        ("w", pa.int32()),
                        ("h", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)

# Parquet schema for eval-mode OCR lines (reference: BDRC/utils.py:1273-1285)
OCR_LINES_SCHEMA = pa.schema(
    [
        ("guid", pa.string()),
        ("text", pa.string()),
        ("encoding", pa.string()),
        ("ctc_conf", pa.float32()),
        ("norm_logp", pa.float32()),
        ("n_beams", pa.int16()),
        ("logits", pa.list_(pa.float32())),
        ("lm_scores", pa.list_(pa.float32())),
    ]
)

# Pixel-pipeline constants (reference defaults scattered as kwargs:
# utils.py:741 clamp 4096x2048, utils.py:713 patch 512, utils.py:796
# binarize block 51 / C 13, inference.py:170/263 thresholds 0.9/0.8,
# inference.py:732 k_factor 2.5 / bbox_tolerance 4.0 / tps 0.25)
PATCH_SIZE = 512
CLAMP_WIDTH = 4096
CLAMP_HEIGHT = 2048
BINARIZE_BLOCK = 51
BINARIZE_C = 13
LINE_CLASS_THRESHOLD = 0.9
LAYOUT_CLASS_THRESHOLD = 0.8
DEFAULT_K_FACTOR = 2.5
DEFAULT_BBOX_TOLERANCE = 4.0
DEFAULT_TPS_THRESHOLD = 0.25
