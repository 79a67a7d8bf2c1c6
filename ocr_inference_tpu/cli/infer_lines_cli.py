"""Detection-only bulk inference CLI -> parquet.

Flag-compatible rework of the reference's PyTorch tiling CLI
(reference: infer_lines_cli.py). The torch DataLoader + CUDA path becomes:
host image loading thread-pool feeding the jitted SegmentationEngine, with
contours extracted per page and written to the LINE_DETECTION_SCHEMA parquet.
Fixes the reference's infer_batch bug that returned after the first image of
every batch (reference: BDRC/utils.py:1237).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from glob import glob

import cv2

from ocr_inference_tpu.geometry import backend as geo
import numpy as np

from ocr_inference_tpu.core.assets import read_line_model_config
from ocr_inference_tpu.core.data import LineDetectionConfig
from ocr_inference_tpu.geometry import get_contours
from ocr_inference_tpu.io.parquet import write_result_parquet
from ocr_inference_tpu.pipeline.builder import build_detection_engine


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Run line segmentation inference using the TPU tiling pipeline"
    )
    parser.add_argument("-i", "--input-dir", required=True,
                        help="Input directory containing images")
    parser.add_argument("-o", "--output-dir", default="parquet_out",
                        help="Output directory for Parquet files")
    parser.add_argument("-c", "--checkpoint", required=True,
                        help="Path to model checkpoint (.msgpack) or line "
                             "model config JSON")
    parser.add_argument("--num-classes", type=int, default=1,
                        help="Number of output classes (default: 1)")
    parser.add_argument("-b", "--batch-size", type=int, default=8,
                        help="Pages per many-pages-one-tensor detection "
                             "batch (tiles of the whole group share one "
                             "device forward stream)")
    parser.add_argument("-w", "--num-workers", type=int, default=4,
                        help="Number of image-loading workers")
    parser.add_argument("-t", "--class-threshold", type=float, default=0.85,
                        help="Sigmoid threshold for binary mask")
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"],
                        help="Device to run inference on")
    parser.add_argument("--no-pin-memory", action="store_true",
                        help="Kept for flag parity (no-op on TPU)")
    parser.add_argument("--allow-random-weights", action="store_true",
                        help="Run with random weights when none are found")
    return parser.parse_args(argv)


def _load_image(path: str):
    img = cv2.imread(path)
    if img is None:
        return path, None
    return path, cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def main(argv=None):
    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)

    if args.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        # some experimental TPU plugins ignore JAX_PLATFORMS; pinning the
        # default device makes the CPU request stick either way
        import jax

        jax.config.update(
            "jax_default_device", jax.local_devices(backend="cpu")[0]
        )

    paths = sorted(
        p
        for p in glob(os.path.join(args.input_dir, "*"))
        if p.lower().endswith((".jpg", ".png", ".jpeg", ".tif", ".tiff"))
    )
    if not paths:
        print(f"No images found in {args.input_dir}")
        sys.exit(1)

    if args.checkpoint.endswith(".json"):
        config = read_line_model_config(args.checkpoint)
    else:
        config = LineDetectionConfig(
            checkpoint=args.checkpoint,
            onnx_file=args.checkpoint,
            architecture="unet",
            patch_size=512,
            classes=["line"] * args.num_classes,
        )
    engine = build_detection_engine(
        config, allow_random=args.allow_random_weights
    )

    os.makedirs(args.output_dir, exist_ok=True)

    start = time.perf_counter()
    n_done = 0
    with ThreadPoolExecutor(max_workers=args.num_workers) as pool:
        # the loader pool overlaps disk decode with device inference; pages
        # run through the many-pages-one-tensor path in -b sized groups, so
        # forward chunks fill completely across page boundaries (reference:
        # the DataLoader collate + infer_batch pattern, utils.py:1142-1237)
        def loaded():
            for path, img in pool.map(_load_image, paths):
                if img is None:
                    print(f"Failed to load image: {path}")
                    continue
                yield path, img

        for path, img, mask in engine.predict_many_batched(
            loaded(), batch_size=args.batch_size,
            class_threshold=args.class_threshold,
        ):
            contours = get_contours(mask)
            result = {
                "image_name": os.path.basename(path),
                "image_width": img.shape[1],
                "image_height": img.shape[0],
                "num_contours": len(contours),
                "contours": [
                    [(int(x), int(y)) for [[x, y]] in cnt] for cnt in contours
                ],
                "bboxes": [
                    tuple(int(v) for v in geo.bounding_rect(cnt))
                    for cnt in contours
                ],
            }
            write_result_parquet(result, out_dir=args.output_dir)
            n_done += 1

    elapsed = time.perf_counter() - start
    print(f"Elapsed inference time: {elapsed:.2f}s")
    print(f"Processed {n_done} images ({n_done / max(elapsed, 1e-9):.2f} img/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
