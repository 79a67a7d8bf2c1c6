"""Batched line-segmentation inference with visual overlay previews.

Script equivalent of the reference's PyTorch-LineInference.ipynb (cells
4-5: GPU tiled segmentation over an image folder, elapsed timing, and a
contour-overlay debug image per page; the bulk parquet path is
``bocr-lines``). Pages run through the many-pages-one-tensor detection
stream.

    python examples/line_inference.py --model line_model/config.json \
        --input pages/ --output previews/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import cv2

from ocr_inference_tpu.core.assets import read_line_model_config
from ocr_inference_tpu.core.data import LineDetectionConfig
from ocr_inference_tpu.geometry import get_contours
from ocr_inference_tpu.pipeline.builder import build_detection_engine
from ocr_inference_tpu.utils import enable_compilation_cache
from ocr_inference_tpu.utils.preview import create_preview_image


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", help="Line model config JSON")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", default="previews")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--allow-random-weights", action="store_true")
    args = parser.parse_args(argv)

    enable_compilation_cache()
    if args.model:
        config = read_line_model_config(args.model)
    else:
        config = LineDetectionConfig(
            checkpoint="", onnx_file="", architecture="unet",
            patch_size=512, classes=["line"],
        )
    engine = build_detection_engine(
        config, allow_random=args.allow_random_weights
    )
    os.makedirs(args.output, exist_ok=True)

    paths = sorted(
        p
        for ext in ("*.jpg", "*.jpeg", "*.png")
        for p in glob.glob(os.path.join(args.input, ext))
    )
    start = time.perf_counter()
    for i in range(0, len(paths), max(1, args.batch_size)):
        loaded = [(p, cv2.imread(p)) for p in paths[i : i + max(1, args.batch_size)]]
        for p, img in loaded:
            if img is None:
                print(f"Failed to load image: {p}")
        batch = [p for p, img in loaded if img is not None]
        images = [
            cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            for _, img in loaded
            if img is not None
        ]
        for path, image, resolve in zip(
            batch, images, engine.predict_many_async(images)
        ):
            mask = resolve()
            contours = get_contours(mask)
            preview = create_preview_image(
                image, line_predictions=list(contours)
            )
            name = os.path.splitext(os.path.basename(path))[0]
            cv2.imwrite(
                os.path.join(args.output, f"{name}_preview.png"),
                cv2.cvtColor(preview, cv2.COLOR_RGB2BGR),
            )
            print(f"{path}: {len(contours)} line contours")
    elapsed = time.perf_counter() - start
    print(f"Elapsed inference time: {elapsed:.2f}s "
          f"({len(paths) / max(elapsed, 1e-9):.2f} img/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
