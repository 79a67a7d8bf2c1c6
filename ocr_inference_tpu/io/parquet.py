"""Parquet writers for detection results and eval-mode OCR lines.

Schema parity with the reference (reference: Config.py:90-115,
BDRC/utils.py:1111-1140 and :1240-1292).
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_inference_tpu.core.config import LINE_DETECTION_SCHEMA, OCR_LINES_SCHEMA


def bboxes_to_pyarrow(bboxes) -> list[dict]:
    return [{"x": x, "y": y, "w": w, "h": h} for (x, y, w, h) in bboxes]


def contours_to_arrow(contours) -> list[list[dict]]:
    return [[{"x": x, "y": y} for x, y in contour] for contour in contours]


def write_result_parquet(result: dict, out_dir: str | Path) -> str:
    """Detection result -> parquet (reference: BDRC/utils.py:1119-1139)."""
    os.makedirs(out_dir, exist_ok=True)
    base_name, _ = os.path.splitext(result["image_name"])
    table = pa.Table.from_pylist(
        [
            {
                "image_name": result["image_name"],
                "image_width": result["image_width"],
                "image_height": result["image_height"],
                "num_contours": result["num_contours"],
                "contours": contours_to_arrow(result["contours"]),
                "bboxes": bboxes_to_pyarrow(result["bboxes"]),
            }
        ],
        schema=LINE_DETECTION_SCHEMA,
    )
    out_path = os.path.join(out_dir, f"{base_name}.parquet")
    pq.write_table(table, out_path, compression="zstd")
    return out_path


def read_result_parquet(path: str | Path) -> dict:
    """Inverse of write_result_parquet (new: the reference only writes)."""
    table = pq.read_table(path)
    row = table.to_pylist()[0]
    row["contours"] = [
        [(p["x"], p["y"]) for p in contour] for contour in row["contours"]
    ]
    row["bboxes"] = [(b["x"], b["y"], b["w"], b["h"]) for b in row["bboxes"]]
    return row


def save_ocr_lines_parquet(ocr_lines, out_path: str | Path) -> None:
    """Eval-mode OCR lines -> parquet (reference: BDRC/utils.py:1240-1292)."""
    data = {
        "guid": [],
        "text": [],
        "encoding": [],
        "ctc_conf": [],
        "norm_logp": [],
        "n_beams": [],
        "logits": [],
        "lm_scores": [],
    }
    for line in ocr_lines:
        data["guid"].append(str(line.guid))
        data["text"].append(line.text)
        data["encoding"].append(line.encoding)
        data["ctc_conf"].append(float(line.ctc_conf) if line.ctc_conf else 0.0)
        data["norm_logp"].append(float(getattr(line, "norm_logp", 0.0)))
        data["n_beams"].append(len(line.logits) if line.logits else 0)
        data["logits"].append(line.logits)
        data["lm_scores"].append(line.lm_scores)
    table = pa.Table.from_pydict(data, schema=OCR_LINES_SCHEMA)
    pq.write_table(table, out_path, compression="zstd", compression_level=7)
