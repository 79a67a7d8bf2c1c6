"""End-to-end OCR demo: one page, then a volume batch with exports.

Script equivalent of the reference's Demo-OCR.ipynb (cells 7-14: single
page `run_ocr`, eval-mode beams saved to parquet, multi-page volume loop
with Text/PageXML outputs and skip-if-done resume).

    python examples/demo_ocr.py --model Models/BDRC/Woodblock \
        --image page.jpg                 # single page
    python examples/demo_ocr.py --model Models/BDRC/Woodblock \
        --folder volume/ --output out/   # volume batch + exports
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import cv2

from ocr_inference_tpu.core.assets import import_local_model, read_line_model_config
from ocr_inference_tpu.core.data import Encoding, OpStatus
from ocr_inference_tpu.io.exporter import PageXMLExporter, TextExporter
from ocr_inference_tpu.io.parquet import save_ocr_lines_parquet
from ocr_inference_tpu.pipeline.builder import build_pipeline, default_line_config
from ocr_inference_tpu.pipeline.volume import VolumeRunner
from ocr_inference_tpu.utils import enable_compilation_cache


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="OCR model directory")
    parser.add_argument("--line-model", help="Line model config JSON")
    parser.add_argument("--image", help="Single page image")
    parser.add_argument("--folder", help="Volume directory")
    parser.add_argument("--output", default="demo_out")
    parser.add_argument("--eval-mode", action="store_true",
                        help="Top-k beams + confidences, saved to parquet "
                             "(Demo-OCR cells 10-12)")
    parser.add_argument("--allow-random-weights", action="store_true")
    args = parser.parse_args(argv)

    enable_compilation_cache()
    model = import_local_model(args.model)
    if model is None:
        print(f"Not a model directory (no model_config.json): {args.model}")
        return 1
    line_cfg = (
        read_line_model_config(args.line_model)
        if args.line_model
        else default_line_config()
    )
    pipeline = build_pipeline(
        model.config, line_cfg, allow_random=args.allow_random_weights
    )
    os.makedirs(args.output, exist_ok=True)

    if args.image:
        image = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        status, result = pipeline.run_ocr(image, eval_mode=args.eval_mode)
        if status != OpStatus.SUCCESS:
            print(f"OCR failed: {result}")
            return 1
        mask, lines, ocr_lines, angle = result
        print(f"angle={angle:.2f}  lines={len(lines)}")
        for line in ocr_lines:
            print(line.text)
        if args.eval_mode:
            save_ocr_lines_parquet(
                ocr_lines, os.path.join(args.output, "ocr_lines.parquet")
            )
        return 0

    if not args.folder:
        parser.error("--image or --folder required")
    paths = sorted(
        p
        for ext in ("*.jpg", "*.jpeg", "*.png", "*.tif", "*.tiff")
        for p in glob.glob(os.path.join(args.folder, ext))
    )

    def loader(path):
        def load():
            img = cv2.imread(path)
            # None keeps per-page isolation: VolumeRunner records a
            # "load failed" page instead of the future raising
            return None if img is None else cv2.cvtColor(
                img, cv2.COLOR_BGR2RGB
            )

        return load

    text_exp = TextExporter(args.output)
    xml_exp = PageXMLExporter(args.output)
    runner = VolumeRunner(pipeline)
    records = runner.run(
        [(os.path.basename(p), loader(p)) for p in paths],
        target_encoding=Encoding.UNICODE,
    )
    for rec, path in zip(records, paths):
        if rec.status != OpStatus.SUCCESS:
            print(f"{rec.name}: FAILED ({rec.error})")
            continue
        image = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        name = os.path.splitext(rec.name)[0]
        text_exp.export_lines(image, name, rec.lines, rec.ocr_lines,
                              angle=rec.angle)
        xml_exp.export_lines(image, name, rec.lines, rec.ocr_lines,
                             angle=rec.angle)
        print(f"{rec.name}: {len(rec.ocr_lines)} lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
