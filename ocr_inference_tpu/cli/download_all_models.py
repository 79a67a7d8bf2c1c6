"""Bulk model download (reference: download_all_models.py)."""

from __future__ import annotations

import sys

from ocr_inference_tpu.core.assets import download_model
from ocr_inference_tpu.core.config import MODEL_DICT


def download_all_models(local_root: str = "Models"):
    for name, repo in MODEL_DICT.items():
        print(f"Downloading {name} ({repo})...")
        download_model(repo, local_root=local_root)


def main(argv=None):
    download_all_models()
    return 0


if __name__ == "__main__":
    sys.exit(main())
