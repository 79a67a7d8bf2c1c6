"""Artifact manager + audit logger (observability on-disk contract).

Same directory layout, manifest, metrics, and JSONL audit schema as the
reference (reference: BDRC/artifact_manager.py, BDRC/audit_logger.py) so
downstream tooling reads either implementation's output.
"""

from __future__ import annotations

import json
import logging
import os
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List, Optional

import cv2
import numpy as np

SUBDIR_NAMES = ["detection", "dewarping", "lines", "results"]


class ArtifactManager:
    """Structured artifact storage (reference: artifact_manager.py:20-139)."""

    def __init__(
        self,
        base_output_dir: str,
        job_id: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
    ):
        self.base_output_dir = Path(base_output_dir)
        self.job_id = job_id or (
            f"{datetime.now().strftime('%Y%m%d_%H%M%S')}_{os.urandom(3).hex()}"
        )
        self.job_dir = self.base_output_dir / self.job_id
        self.config = config or {}
        self.manifest: List[Dict[str, str]] = []
        self.page_metrics: Dict[str, Dict[str, Any]] = {}
        self.current_page: Optional[str] = None
        self._base_dir: Path = self.job_dir

    @property
    def subdirs(self) -> Dict[str, Path]:
        return {name: self._base_dir / name for name in SUBDIR_NAMES}

    def create_directory_structure(self):
        self.job_dir.mkdir(parents=True, exist_ok=True)

    def set_current_page(self, page_name: str):
        self.current_page = page_name
        self._base_dir = self.job_dir / page_name
        self._base_dir.mkdir(parents=True, exist_ok=True)

    def _ensure_subdir(self, subdir: str) -> Path:
        if subdir not in SUBDIR_NAMES:
            raise ValueError(f"Unknown subdirectory: {subdir}")
        path = self.subdirs[subdir]
        path.mkdir(parents=True, exist_ok=True)
        return path

    def get_results_dir(self) -> Path:
        return self._ensure_subdir("results")

    def _add_to_manifest(self, name: str, artifact_type: str, path: str):
        self.manifest.append(
            {
                "name": name,
                "type": artifact_type,
                "path": path,
                "timestamp": datetime.now().isoformat(),
            }
        )

    def save_config(self):
        path = self.job_dir / "config.json"
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.config, f, indent=2, default=str)
        self._add_to_manifest("config.json", "configuration", str(path))

    def save_image(self, name: str, image: np.ndarray, subdir: str,
                   fmt: str = "png") -> Path:
        path = self._ensure_subdir(subdir) / f"{name}.{fmt}"
        cv2.imwrite(str(path), image)
        self._add_to_manifest(name, "image", str(path))
        return path

    def save_json(self, name: str, data: Any, subdir: str) -> Path:
        path = self._ensure_subdir(subdir) / f"{name}.json"
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2, default=str)
        self._add_to_manifest(name, "json", str(path))
        return path

    def save_numpy(self, name: str, array: np.ndarray, subdir: str) -> Path:
        path = self._ensure_subdir(subdir) / f"{name}.npy"
        np.save(path, array)
        self._add_to_manifest(name, "numpy", str(path))
        return path

    def save_text(self, name: str, text: str, subdir: str, ext: str = "txt") -> Path:
        path = self._ensure_subdir(subdir) / f"{name}.{ext}"
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        self._add_to_manifest(name, "text", str(path))
        return path

    def generate_manifest(self) -> Path:
        path = self.job_dir / "manifest.json"
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "job_id": self.job_id,
                    "created": datetime.now().isoformat(),
                    "artifacts": self.manifest,
                },
                f,
                indent=2,
            )
        return path

    def save_metrics(self, metrics: Dict[str, Any]) -> Path:
        if self.current_page:
            self.page_metrics[self.current_page] = metrics
            return self.job_dir / "metrics.json"
        path = self.job_dir / "metrics.json"
        with open(path, "w", encoding="utf-8") as f:
            json.dump(metrics, f, indent=2, default=str)
        return path

    def save_aggregate_metrics(self) -> Path:
        total_duration = sum(
            m.get("total_duration_ms", 0) for m in self.page_metrics.values()
        )
        total_lines = sum(
            m.get("lines_detected", 0) for m in self.page_metrics.values()
        )
        successful = sum(
            1 for m in self.page_metrics.values() if m.get("status") != "failed"
        )
        aggregate = {
            "job_summary": {
                "total_pages": len(self.page_metrics),
                "successful_pages": successful,
                "total_duration_ms": total_duration,
                "avg_duration_per_page_ms": (
                    total_duration / len(self.page_metrics)
                    if self.page_metrics
                    else 0
                ),
                "total_lines_detected": total_lines,
            },
            "per_page_metrics": self.page_metrics,
        }
        path = self.job_dir / "metrics.json"
        with open(path, "w", encoding="utf-8") as f:
            json.dump(aggregate, f, indent=2, default=str)
        return path

    # -- resume support (new; reference had none, SURVEY §5.3-5.4) --

    def completed_pages(self) -> set[str]:
        """Pages with a written metrics entry from a previous run of the same
        job dir — the idempotent-resume check used by the batch CLI."""
        path = self.job_dir / "metrics.json"
        if not path.is_file():
            return set()
        try:
            data = json.loads(path.read_text(encoding="utf-8"))
        except json.JSONDecodeError:
            return set()
        per_page = data.get("per_page_metrics", {})
        return {k for k, v in per_page.items() if v.get("status") != "failed"}


class JSONFormatter(logging.Formatter):
    """JSON-lines log record formatter (reference: audit_logger.py:10-24)."""

    def format(self, record: logging.LogRecord) -> str:
        log_obj = {
            "timestamp": datetime.now(timezone.utc).isoformat().replace(
                "+00:00", "Z"
            ),
            "level": record.levelname,
            "message": record.getMessage(),
        }
        for key in ("job_id", "stage", "operation", "status", "metadata"):
            if hasattr(record, key):
                log_obj[key] = getattr(record, key)
        if record.exc_info:
            log_obj["exception"] = self.formatException(record.exc_info)
        return json.dumps(log_obj, default=str)


class AuditLogger:
    """Structured per-job audit logger (reference: audit_logger.py:27-64)."""

    def __init__(self, job_id: str, log_file: Path):
        self.job_id = job_id
        self.logger = logging.getLogger(f"ocr_audit_{job_id}")
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        self.logger.propagate = False
        log_file = Path(log_file)
        log_file.parent.mkdir(parents=True, exist_ok=True)
        handler = logging.FileHandler(log_file, encoding="utf-8")
        handler.setFormatter(JSONFormatter())
        self.logger.addHandler(handler)

    def log(self, level: str, message: str, exc_info: bool = False, **kwargs):
        extra = {
            "job_id": self.job_id,
            **{k: v for k, v in kwargs.items() if v is not None},
        }
        getattr(self.logger, level.lower())(message, extra=extra, exc_info=exc_info)

    def log_stage_start(self, stage: str, metadata: Optional[Dict] = None):
        self.log(
            "INFO",
            f"Starting stage: {stage}",
            stage=stage,
            operation="stage_start",
            metadata=metadata,
        )

    def log_stage_end(
        self, stage: str, status: str = "success", metadata: Optional[Dict] = None
    ):
        self.log(
            "INFO",
            f"Completed stage: {stage}",
            stage=stage,
            operation="stage_end",
            status=status,
            metadata=metadata,
        )

    def log_operation(
        self, operation: str, stage: Optional[str] = None, status: str = "success"
    ):
        self.log(
            "INFO",
            f"Operation: {operation}",
            stage=stage,
            operation=operation,
            status=status,
        )

    def log_error(
        self,
        error_msg: str,
        stage: Optional[str] = None,
        operation: Optional[str] = None,
        exc_info: bool = True,
    ):
        self.log(
            "ERROR",
            error_msg,
            stage=stage,
            operation=operation,
            status="failure",
            exc_info=exc_info,
        )
