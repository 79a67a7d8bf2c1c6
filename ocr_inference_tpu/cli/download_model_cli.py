"""Model download CLI (reference: download_model_cli.py)."""

from __future__ import annotations

import argparse
import sys

from ocr_inference_tpu.core.assets import download_model
from ocr_inference_tpu.core.config import MODEL_DICT


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Download a BDRC OCR model from HuggingFace"
    )
    parser.add_argument(
        "--model", required=True, choices=sorted(MODEL_DICT.keys()),
        help="Model registry key",
    )
    parser.add_argument("--out", default="Models", help="Local model root")
    args = parser.parse_args(argv)

    config_path = download_model(MODEL_DICT[args.model], local_root=args.out)
    print(f"Downloaded {args.model}; config at {config_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
