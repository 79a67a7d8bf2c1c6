"""Modern-book layout detection demo (headers/footers -> JSON per page).

Script equivalent of the reference's ModernLayoutDetection.ipynb (cell 2:
``ModernBookFormatLayoutDetection`` over an image folder with
``filter_classes=["header", "footer"]``).

    python examples/modern_layout.py --model layout_config.json \
        --input pages/ --output layout_out/
"""

from __future__ import annotations

import argparse
import sys

from ocr_inference_tpu.core.assets import read_layout_model_config
from ocr_inference_tpu.core.data import LayoutDetectionConfig
from ocr_inference_tpu.pipeline.modern_layout import (
    ModernBookFormatLayoutDetection,
)
from ocr_inference_tpu.utils import enable_compilation_cache


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", help="Layout model config JSON")
    parser.add_argument("--input", required=True, help="Page image directory")
    parser.add_argument("--output", default="layout_out")
    parser.add_argument("--filter-classes", nargs="*",
                        default=["header", "footer"])
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--allow-random-weights", action="store_true")
    args = parser.parse_args(argv)

    enable_compilation_cache()
    if args.model:
        config = read_layout_model_config(args.model)
    else:
        config = LayoutDetectionConfig(
            checkpoint="", onnx_file="", architecture="deeplabv3plus",
            patch_size=512,
            classes=["background", "header", "footer", "text"],
        )
    det = ModernBookFormatLayoutDetection(
        config, allow_random=args.allow_random_weights
    )
    results = det.run(
        args.input, args.output, filter_classes=args.filter_classes,
        batch_size=args.batch_size,
    )
    for path, record in results.items():
        print(f"{path}: {record}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
