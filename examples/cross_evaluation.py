"""CER cross-evaluation across recognizer architectures.

Script equivalent of the reference's OCR-CrossEvaluation-Sketchbook.ipynb
(cells 3-9): run several OCR models over every distribution folder of a
line-image + label dataset (e.g. BDRC/Uchan-OCR-EVAL) and write one
``{architecture}.txt`` score file per model.

    python examples/cross_evaluation.py \
        --models Models/Easter2 Models/Easter2-Attention \
        --dataset Uchan-OCR-EVAL --output scores/
"""

from __future__ import annotations

import argparse
import sys

from ocr_inference_tpu.cli.evaluate_cli import main as evaluate_main


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", required=True,
                        help="Model directories (one per architecture)")
    parser.add_argument("--dataset", required=True,
                        help="Dataset root with distribution subfolders")
    parser.add_argument("--output", default="scores")
    parser.add_argument("--allow-random-weights", action="store_true")
    args = parser.parse_args(argv)

    for model_dir in args.models:
        cli_args = [
            "--model", model_dir,
            "--dataset", args.dataset,
            "--output", args.output,
        ]
        if args.allow_random_weights:
            cli_args.append("--allow-random-weights")
        rc = evaluate_main(cli_args)
        if rc != 0:
            return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
