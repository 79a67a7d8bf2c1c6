"""Result exporters: plain text, PageXML (Transkribus-compatible), JSONL.

Byte-compatible with the reference exporters (reference: BDRC/exporter.py):
same PcGts 2013-07-15 namespace and attribute set, same line ids
(``line_9874_{i}``), same readingOrder custom attrs, same minidom
pretty-printing, same un-rotation of contours before writing.
"""

from __future__ import annotations

import abc
import json
import logging
import xml.etree.ElementTree as etree
from datetime import datetime
from typing import List, Optional

import numpy as np

from ocr_inference_tpu.core.data import BBox, Line, OCRLine
from ocr_inference_tpu.geometry import get_text_bbox, optimize_contour, rotate_contour


def get_utc_time() -> str:
    """Timestamp format parity (reference: BDRC/utils.py:92-102 — local time
    formatted as ISO, despite the name)."""
    return datetime.now().strftime("%Y-%m-%dT%H:%M:%S")


class Exporter(abc.ABC):
    """Base exporter (reference: BDRC/exporter.py:24-113)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        logging.info("Init Exporter")

    @abc.abstractmethod
    def export_lines(
        self,
        image: Optional[np.ndarray],
        image_name: str,
        lines: List[Line],
        text_lines: List[OCRLine],
    ):
        raise NotImplementedError

    @staticmethod
    def get_bbox(bbox: BBox) -> tuple[int, int, int, int]:
        return bbox.x, bbox.y, bbox.w, bbox.h

    @staticmethod
    def get_text_points(contour) -> str:
        """"x,y x,y ..." with a trailing space (reference: exporter.py:81-96)."""
        points = ""
        for box in contour:
            points += f"{box[0][0]},{box[0][1]} "
        return points

    @staticmethod
    def get_bbox_points(bbox: BBox) -> str:
        return (
            f"{bbox.x},{bbox.y} {bbox.x + bbox.w},{bbox.y} "
            f"{bbox.x + bbox.w},{bbox.y + bbox.h} {bbox.x},{bbox.y + bbox.h}"
        )


class PageXMLExporter(Exporter):
    """PageXML writer (reference: BDRC/exporter.py:116-276)."""

    def get_text_line_block(self, coordinate: str, index: int, unicode_text: str):
        text_line = etree.Element("TextLine")
        text_line.attrib["id"] = f"line_9874_{str(index)}"
        text_line.attrib["custom"] = f"readingOrder {{index: {str(index)};}}"
        coords_points = etree.SubElement(text_line, "Coords")
        coords_points.attrib["points"] = coordinate
        text_equiv = etree.SubElement(text_line, "TextEquiv")
        unicode_field = etree.SubElement(text_equiv, "Unicode")
        unicode_field.text = unicode_text
        return text_line

    def build_xml_document(
        self,
        image: np.ndarray,
        image_name: str,
        text_bbox: str,
        lines: List[str],
        text_lines: Optional[List[OCRLine]],
    ) -> str:
        from xml.dom import minidom

        root = etree.Element("PcGts")
        root.attrib["xmlns"] = (
            "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
        )
        root.attrib["xmlns:xsi"] = "http://www.w3.org/2001/XMLSchema-instance"
        root.attrib["xsi:schemaLocation"] = (
            "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15 "
            "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15/pagecontent.xsd"
        )

        metadata = etree.SubElement(root, "Metadata")
        creator = etree.SubElement(metadata, "Creator")
        creator.text = "Transkribus"
        created = etree.SubElement(metadata, "Created")
        created.text = get_utc_time()

        page = etree.SubElement(root, "Page")
        page.attrib["imageFilename"] = image_name
        page.attrib["imageWidth"] = f"{image.shape[1]}"
        page.attrib["imageHeight"] = f"{image.shape[0]}"

        reading_order = etree.SubElement(page, "ReadingOrder")
        ordered_group = etree.SubElement(reading_order, "OrderedGroup")
        ordered_group.attrib["id"] = f"1234_{0}"
        ordered_group.attrib["caption"] = "Regions reading order"

        region_ref_indexed = etree.SubElement(reading_order, "RegionRefIndexed")
        region_ref_indexed.attrib["index"] = "0"
        region_ref = "region_main"
        region_ref_indexed.attrib["regionRef"] = region_ref

        text_region = etree.SubElement(page, "TextRegion")
        text_region.attrib["id"] = region_ref
        text_region.attrib["custom"] = "readingOrder {index:0;}"

        text_region_coords = etree.SubElement(text_region, "Coords")
        text_region_coords.attrib["points"] = text_bbox

        for l_idx, line in enumerate(lines):
            if text_lines is not None and len(text_lines) > 0:
                text_region.append(
                    self.get_text_line_block(
                        coordinate=line,
                        index=l_idx,
                        unicode_text=text_lines[l_idx].text,
                    )
                )
            else:
                text_region.append(
                    self.get_text_line_block(
                        coordinate=line, index=l_idx, unicode_text=""
                    )
                )

        parsed_xml = minidom.parseString(etree.tostring(root))
        return parsed_xml.toprettyxml()

    def export_lines(
        self,
        image: Optional[np.ndarray],
        image_name: str,
        lines: List[Line],
        text_lines: List[OCRLine],
        optimize: bool = True,
        bbox: bool = False,
        angle: float = 0.0,
    ):
        if angle != abs(0):
            x_center = image.shape[1] // 2
            y_center = image.shape[0] // 2
            for line in lines:
                line.contour = rotate_contour(
                    line.contour, (x_center, y_center), angle
                )
        if optimize:
            for line in lines:
                line.contour = optimize_contour(line.contour)

        if bbox:
            plain_lines = [str(self.get_bbox(x.bbox)) for x in lines]
        else:
            plain_lines = [self.get_text_points(x.contour) for x in lines]

        text_bbox = get_text_bbox(lines)
        plain_box = self.get_bbox_points(text_bbox)

        xml_doc = self.build_xml_document(
            image,
            image_name,
            text_bbox=plain_box,
            lines=plain_lines,
            text_lines=text_lines,
        )
        out_file = f"{self.output_dir}/{image_name}.xml"
        with open(out_file, "w", encoding="UTF-8") as f:
            f.write(xml_doc)
        return out_file


class TextExporter(Exporter):
    """Plain text writer, one line per row
    (reference: BDRC/exporter.py:279-334)."""

    def export_lines(
        self,
        image: Optional[np.ndarray],
        image_name: str,
        lines: List[Line],
        text_lines: List[OCRLine],
        **_: object,
    ):
        out_file = f"{self.output_dir}/{image_name}.txt"
        with open(out_file, "w", encoding="UTF-8") as f:
            for line in text_lines:
                f.write(f"{line.text}\n")
        return out_file

    def export_text(self, image_name: str, text_lines: List[OCRLine]):
        return self.export_lines(None, image_name, [], text_lines)


class JsonExporter(Exporter):
    """Single-record .jsonl writer (reference: BDRC/exporter.py:337-407)."""

    def export_lines(
        self,
        image: Optional[np.ndarray],
        image_name: str,
        lines: List[Line],
        text_lines: List[OCRLine],
        optimize: bool = True,
        bbox: bool = False,
        angle: float = 0.0,
    ):
        if angle != abs(0):
            x_center = image.shape[1] // 2
            y_center = image.shape[0] // 2
            for line in lines:
                line.contour = rotate_contour(
                    line.contour, (x_center, y_center), angle
                )
        if optimize:
            for line in lines:
                line.contour = optimize_contour(line.contour)

        if bbox:
            plain_lines = [self.get_bbox(x.bbox) for x in lines]
        else:
            plain_lines = [self.get_text_points(x.contour) for x in lines]

        text_bbox = get_text_bbox(lines)
        plain_box = self.get_bbox_points(text_bbox)
        json_record = {
            "image": image_name,
            "textbox": plain_box,
            "lines": plain_lines,
            "text": [x.text for x in text_lines],
        }
        out_file = f"{self.output_dir}/{image_name}.jsonl"
        with open(out_file, "w", encoding="UTF-8") as f:
            json.dump(json_record, f, ensure_ascii=False, indent=1)
        return out_file
