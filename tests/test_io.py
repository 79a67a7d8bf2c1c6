"""Exporter, parquet, artifact, and audit logger tests (incl. PageXML
structural parity with the reference writer)."""

import json
import xml.etree.ElementTree as etree

import numpy as np
import pytest

from ocr_inference_tpu.core.data import ArtifactConfig, BBox, Line, OCRLine, generate_guid
from ocr_inference_tpu.io import (
    ArtifactManager,
    AuditLogger,
    JsonExporter,
    PageXMLExporter,
    TextExporter,
    read_result_parquet,
    save_ocr_lines_parquet,
    write_result_parquet,
)


def _lines_fixture():
    def mk(x, y, w, h):
        contour = np.array(
            [[[x, y]], [[x + w, y]], [[x + w, y + h]], [[x, y + h]]], np.int32
        )
        return Line(generate_guid(23), contour, BBox(x, y, w, h),
                    (x + w // 2, y + h // 2))

    lines = [mk(50, 100, 700, 30), mk(50, 200, 700, 30)]
    texts = [
        OCRLine(lines[0].guid, "བཀྲ་ཤིས་", "UNICODE"),
        OCRLine(lines[1].guid, "བདེ་ལེགས།", "UNICODE"),
    ]
    return lines, texts


def test_text_exporter(tmp_path):
    lines, texts = _lines_fixture()
    img = np.zeros((400, 800, 3), np.uint8)
    TextExporter(str(tmp_path)).export_lines(img, "page1", lines, texts)
    content = (tmp_path / "page1.txt").read_text(encoding="utf-8")
    assert content == "བཀྲ་ཤིས་\nབདེ་ལེགས།\n"


def test_pagexml_structure(tmp_path):
    lines, texts = _lines_fixture()
    img = np.zeros((400, 800, 3), np.uint8)
    PageXMLExporter(str(tmp_path)).export_lines(img, "page1", lines, texts)
    doc = (tmp_path / "page1.xml").read_text(encoding="utf-8")

    # structural parity with the reference writer (BDRC/exporter.py:162-233)
    assert '<?xml version="1.0" ?>' in doc
    root = etree.fromstring(doc)
    ns = "{http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15}"
    assert root.tag == f"{ns}PcGts"
    creator = root.find(f"{ns}Metadata/{ns}Creator")
    assert creator.text == "Transkribus"
    page = root.find(f"{ns}Page")
    assert page.attrib["imageWidth"] == "800"
    assert page.attrib["imageHeight"] == "400"
    assert page.attrib["imageFilename"] == "page1"
    region = page.find(f"{ns}TextRegion")
    assert region.attrib["id"] == "region_main"
    text_lines = region.findall(f"{ns}TextLine")
    assert len(text_lines) == 2
    assert text_lines[0].attrib["id"] == "line_9874_0"
    assert text_lines[0].attrib["custom"] == "readingOrder {index: 0;}"
    unicode_el = text_lines[0].find(f"{ns}TextEquiv/{ns}Unicode")
    assert unicode_el.text == "བཀྲ་ཤིས་"
    coords = text_lines[0].find(f"{ns}Coords")
    assert "," in coords.attrib["points"]


def test_pagexml_unrotates_contours(tmp_path):
    lines, texts = _lines_fixture()
    img = np.zeros((400, 800, 3), np.uint8)
    before = lines[0].contour.copy()
    PageXMLExporter(str(tmp_path)).export_lines(
        img, "page2", lines, texts, angle=2.0
    )
    # contours are rotated in place before writing (reference behavior)
    assert not np.array_equal(before, lines[0].contour)


def test_json_exporter(tmp_path):
    lines, texts = _lines_fixture()
    img = np.zeros((400, 800, 3), np.uint8)
    JsonExporter(str(tmp_path)).export_lines(img, "page1", lines, texts)
    rec = json.loads((tmp_path / "page1.jsonl").read_text(encoding="utf-8"))
    assert rec["image"] == "page1"
    assert len(rec["lines"]) == 2
    assert rec["text"] == ["བཀྲ་ཤིས་", "བདེ་ལེགས།"]
    assert "textbox" in rec


def test_detection_parquet_roundtrip(tmp_path):
    result = {
        "image_name": "scan_0001.jpg",
        "image_width": 800,
        "image_height": 400,
        "num_contours": 2,
        "contours": [[(1, 2), (3, 4)], [(5, 6), (7, 8), (9, 10)]],
        "bboxes": [(1, 2, 10, 5), (5, 6, 20, 8)],
    }
    path = write_result_parquet(result, tmp_path)
    assert path.endswith("scan_0001.parquet")
    back = read_result_parquet(path)
    assert back["image_name"] == "scan_0001.jpg"
    assert back["contours"] == result["contours"]
    assert back["bboxes"] == result["bboxes"]


def test_ocr_lines_parquet(tmp_path):
    _, texts = _lines_fixture()
    texts[0].ctc_conf = 0.93
    texts[0].logits = [-1.5, -2.5]
    out = tmp_path / "lines.parquet"
    save_ocr_lines_parquet(texts, out)
    import pyarrow.parquet as pq

    table = pq.read_table(out)
    assert table.num_rows == 2
    assert table.column("text").to_pylist() == ["བཀྲ་ཤིས་", "བདེ་ལེགས།"]
    assert table.column("n_beams").to_pylist() == [2, 0]


def test_artifact_manager_layout_and_metrics(tmp_path):
    mgr = ArtifactManager(str(tmp_path), job_id="testjob")
    mgr.create_directory_structure()
    img = np.zeros((10, 10), np.uint8)
    mgr.save_image("line_mask", img, "detection")
    mgr.save_json("contours_raw", {"count": 0}, "detection")
    mgr.save_text("page", "hello", "results")
    with pytest.raises(ValueError):
        mgr.save_json("x", {}, "bogus_subdir")

    # batch mode: per-page dirs + aggregated metrics
    mgr.set_current_page("page1")
    mgr.save_metrics({"total_duration_ms": 100, "lines_detected": 4})
    mgr.set_current_page("page2")
    mgr.save_metrics({"total_duration_ms": 50, "lines_detected": 2})
    mgr.save_aggregate_metrics()
    metrics = json.loads((tmp_path / "testjob" / "metrics.json").read_text())
    assert metrics["job_summary"]["total_pages"] == 2
    assert metrics["job_summary"]["total_duration_ms"] == 150
    assert metrics["job_summary"]["avg_duration_per_page_ms"] == 75
    assert metrics["job_summary"]["total_lines_detected"] == 6

    manifest_path = mgr.generate_manifest()
    manifest = json.loads(manifest_path.read_text())
    assert manifest["job_id"] == "testjob"
    assert len(manifest["artifacts"]) == 3

    # resume: completed pages visible to a new manager on the same dir
    mgr2 = ArtifactManager(str(tmp_path), job_id="testjob")
    assert mgr2.completed_pages() == {"page1", "page2"}


def test_audit_logger_jsonl_schema(tmp_path):
    log_file = tmp_path / "audit.log"
    logger = AuditLogger("job42", log_file)
    logger.log_stage_start("line_detection", metadata={"shape": (1, 2)})
    logger.log_stage_end("line_detection")
    logger.log_operation("ocr_line_1", stage="ocr_inference")
    logger.log_error("boom", stage="dewarping", exc_info=False)

    records = [
        json.loads(line) for line in log_file.read_text().strip().splitlines()
    ]
    assert len(records) == 4
    assert records[0]["job_id"] == "job42"
    assert records[0]["operation"] == "stage_start"
    assert records[0]["stage"] == "line_detection"
    assert records[1]["status"] == "success"
    assert records[3]["level"] == "ERROR"
    assert records[3]["status"] == "failure"
    assert records[0]["timestamp"].endswith("Z")
