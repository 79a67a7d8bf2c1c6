"""Detection-only bulk CLI test: images dir -> per-page parquet.

Covers the many-pages-one-tensor batching path (reference:
infer_lines_cli.py + BDRC/utils.py:1142-1237, whose infer_batch returned
after the first image of every batch — every page must yield a file here).
"""

import cv2
import numpy as np
import pyarrow.parquet as pq

from ocr_inference_tpu.cli.infer_lines_cli import main


def _page(h=600, w=1200, n_lines=3):
    img = np.full((h, w, 3), 235, np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        img[y0 : y0 + 24, 60 : w - 60] = 40
    return img


def test_infer_lines_cli_end_to_end(tmp_path):
    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(5):
        cv2.imwrite(str(src / f"page{i}.png"), _page(n_lines=2 + i % 3))
    out = tmp_path / "parquet"

    rc = main(
        [
            "-i", str(src),
            "-o", str(out),
            "-c", "nonexistent.msgpack",
            "-b", "2",
            "--allow-random-weights",
            "--device", "cpu",
        ]
    )
    assert rc == 0
    files = sorted(out.glob("*.parquet"))
    assert len(files) == 5  # one per page, not one per batch
    table = pq.read_table(files[0])
    cols = set(table.column_names)
    assert {"image_name", "image_width", "image_height", "num_contours",
            "contours", "bboxes"} <= cols
    assert table.column("image_width")[0].as_py() == 1200
