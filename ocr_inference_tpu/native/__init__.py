"""Native (C++) components: geometry library and ARPA LM scorer.

Shared objects build lazily with g++ on first use and load through ctypes;
every native capability has a pure-Python/cv2 behavioral twin in the
framework, so absence of a toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIBS: dict[str, Optional[ctypes.CDLL]] = {}


def _build_and_load(name: str, source: str) -> Optional[ctypes.CDLL]:
    if name in _LIBS:
        return _LIBS[name]
    so_path = _DIR / f"lib{name}.so"
    src_path = _DIR / source
    try:
        if (not so_path.is_file()
                or so_path.stat().st_mtime < src_path.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", str(src_path), "-o", str(so_path)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so_path))
    except (OSError, subprocess.CalledProcessError) as e:
        # stderr: bocr-serve speaks JSONL on stdout (cli/serve_cli.py)
        print(
            f"native {name} unavailable ({e}); using Python fallback",
            file=sys.stderr,
        )
        lib = None
    _LIBS[name] = lib
    return lib


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def _geometry_lib() -> Optional[ctypes.CDLL]:
    lib = _build_and_load("ocr_geometry", "geometry.cpp")
    if lib is not None and not getattr(lib, "_configured", False):
        lib.ocr_find_contours.restype = ctypes.c_int
        lib.ocr_contour_area.restype = ctypes.c_double
        lib.ocr_convex_hull.restype = ctypes.c_int
        lib.ocr_arc_length.restype = ctypes.c_double
        lib.ocr_approx_poly_dp.restype = ctypes.c_int
        lib.ocr_line_threshold.restype = ctypes.c_double
        lib.ocr_attempt_height.restype = ctypes.c_int
        lib.ocr_pack_line_bits.restype = None
        lib.ocr_masked_crop.restype = None
        lib._configured = True
    return lib


def native_available() -> bool:
    return _geometry_lib() is not None


def find_contours(mask: np.ndarray) -> list[np.ndarray]:
    """One outer contour per 8-connected component, points as (N, 1, 2)
    int32 arrays (cv2 convention)."""
    lib = _geometry_lib()
    if lib is None:
        raise RuntimeError("native geometry library unavailable")
    # the C++ side already treats any nonzero byte as foreground, so a
    # uint8 mask needs no normalization pass (a full-page copy per call)
    if mask.dtype != np.uint8:
        mask = (mask != 0).astype(np.uint8)
    mask = np.ascontiguousarray(mask)
    h, w = mask.shape
    max_points = int(4 * h * w + 64)
    max_contours = 65536
    points = np.empty(max_points * 2, np.int32)
    offsets = np.empty(max_contours + 1, np.int64)
    n = lib.ocr_find_contours(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(max_points * 2),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_contours,
    )
    if n < 0:
        raise RuntimeError(f"ocr_find_contours overflow (code {n})")
    out = []
    for i in range(n):
        lo, hi = offsets[i], offsets[i + 1]
        out.append(points[2 * lo : 2 * hi].reshape(-1, 1, 2).copy())
    return out


def line_threshold(mask: np.ndarray, slice_width: int = 20) -> float:
    """The full slice-vote row-grouping threshold
    (geometry/lines.py:get_line_threshold; reference
    line_detection.py:362-421) in one native call — no per-slice Python
    roundtrips, slice copies, or points buffers."""
    lib = _geometry_lib()
    if lib is None:
        raise RuntimeError("native geometry library unavailable")
    if mask.dtype != np.uint8:
        mask = (mask != 0).astype(np.uint8)
    if mask.ndim != 2:
        raise ValueError("line_threshold expects a 2-D mask")
    if mask.strides[1] != 1:
        mask = np.ascontiguousarray(mask)
    h, w = mask.shape
    return float(
        lib.ocr_line_threshold(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h,
            w,
            ctypes.c_int64(mask.strides[0]),
            slice_width,
        )
    )


_U8P = ctypes.POINTER(ctypes.c_uint8)
_U64P = ctypes.POINTER(ctypes.c_uint64)
_I32P = ctypes.POINTER(ctypes.c_int32)


class PackedLineRoi:
    """Packed-bit state for one line's adaptive-k strip extraction
    (geometry/lines.py _LineRoi fast path; reference
    line_detection.py:267-327). Bit rows are LSB-first u64 words; attempts
    cost ~H*W/64 word ops in C++ instead of six cv2 byte passes, and the
    accepted attempt's masked crop materializes in one fused pass."""

    def __init__(self, roi: np.ndarray, mask: np.ndarray):
        lib = _geometry_lib()
        if lib is None:
            raise RuntimeError("native geometry library unavailable")
        if roi.ndim == 2:
            roi = roi[..., None]
        h, w, c = roi.shape
        if roi.dtype != np.uint8 or (c > 1 and roi.strides[2] != 1) \
                or roi.strides[1] < 0 or roi.strides[0] < 0:
            raise ValueError("PackedLineRoi needs interleaved uint8")
        mask = np.ascontiguousarray(mask)
        self._lib = lib
        self._roi = roi
        self.h, self.w, self.c = h, w, c
        self.nw = (w + 63) // 64
        self.mask_bits = np.zeros(h * self.nw, np.uint64)
        self.nz_bits = np.zeros(c * h * self.nw, np.uint64)
        lib.ocr_pack_line_bits(
            roi.ctypes.data_as(_U8P),
            ctypes.c_int64(roi.strides[0]),
            ctypes.c_int64(roi.strides[1]),
            c,
            mask.ctypes.data_as(_U8P),
            ctypes.c_int64(mask.strides[0]),
            h,
            w,
            self.nw,
            self.mask_bits.ctypes.data_as(_U64P),
            self.nz_bits.ctypes.data_as(_U64P),
        )

    def attempt_height(self, kw: int, kh: int) -> int:
        return int(
            self._lib.ocr_attempt_height(
                self.mask_bits.ctypes.data_as(_U64P),
                self.nz_bits.ctypes.data_as(_U64P),
                self.c,
                self.h,
                self.nw,
                kw,
                kh,
            )
        )

    def masked_crop(self, kw: int, kh: int) -> np.ndarray:
        out = np.empty(self.h * self.w * self.c, np.uint8)
        oh = ctypes.c_int(0)
        ow = ctypes.c_int(0)
        self._lib.ocr_masked_crop(
            self._roi.ctypes.data_as(_U8P),
            ctypes.c_int64(self._roi.strides[0]),
            ctypes.c_int64(self._roi.strides[1]),
            self.c,
            self.mask_bits.ctypes.data_as(_U64P),
            self.nz_bits.ctypes.data_as(_U64P),
            self.h,
            self.w,
            self.nw,
            kw,
            kh,
            out.ctypes.data_as(_U8P),
            ctypes.byref(oh),
            ctypes.byref(ow),
        )
        h2, w2 = oh.value, ow.value
        if h2 == 0:
            return np.zeros((0, self.w, self.c), np.uint8)
        return out[: h2 * w2 * self.c].reshape(h2, w2, self.c).copy()


def contour_area(contour: np.ndarray) -> float:
    lib = _geometry_lib()
    pts = np.ascontiguousarray(contour.reshape(-1, 2).astype(np.int32))
    return float(
        lib.ocr_contour_area(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(pts)
        )
    )


def bounding_rect(contour: np.ndarray) -> tuple[int, int, int, int]:
    lib = _geometry_lib()
    pts = np.ascontiguousarray(contour.reshape(-1, 2).astype(np.int32))
    out = np.empty(4, np.int32)
    lib.ocr_bounding_rect(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return tuple(int(v) for v in out)


def convex_hull(contour: np.ndarray) -> np.ndarray:
    lib = _geometry_lib()
    pts = np.ascontiguousarray(contour.reshape(-1, 2).astype(np.int32))
    out = np.empty((len(pts) + 1) * 2, np.int32)
    n = lib.ocr_convex_hull(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[: 2 * n].reshape(-1, 1, 2).copy()


def min_area_rect(contour: np.ndarray):
    """((cx, cy), (w, h), angle_deg) like cv2.minAreaRect."""
    lib = _geometry_lib()
    pts = np.ascontiguousarray(contour.reshape(-1, 2).astype(np.int32))
    out = np.empty(5, np.float64)
    lib.ocr_min_area_rect(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return (float(out[0]), float(out[1])), (float(out[2]), float(out[3])), float(out[4])


def arc_length(contour: np.ndarray, closed: bool = True) -> float:
    lib = _geometry_lib()
    pts = np.ascontiguousarray(contour.reshape(-1, 2).astype(np.int32))
    return float(
        lib.ocr_arc_length(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(pts),
            1 if closed else 0,
        )
    )


def approx_poly_dp(
    contour: np.ndarray, epsilon: float, closed: bool = True
) -> np.ndarray:
    """Douglas-Peucker simplification, cv2.approxPolyDP-shaped output
    (N, 1, 2). Closed curves anchor on the mutually-farthest vertex pair, so
    the result does not depend on the trace start point."""
    lib = _geometry_lib()
    pts = np.ascontiguousarray(contour.reshape(-1, 2).astype(np.int32))
    out = np.empty(pts.size, np.int32)
    n = lib.ocr_approx_poly_dp(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(pts),
        ctypes.c_double(epsilon),
        1 if closed else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[: 2 * n].reshape(-1, 1, 2).copy()


# ---------------------------------------------------------------------------
# ARPA LM
# ---------------------------------------------------------------------------

class NativeArpaLM:
    """ctypes wrapper over the C++ ARPA scorer; same interface as
    decode.arpa_lm.ArpaLM."""

    def __init__(self, arpa_path):
        lib = _build_and_load("ocr_arpa", "arpa_lm.cpp")
        if lib is None:
            raise RuntimeError("native arpa library unavailable")
        if not getattr(lib, "_configured", False):
            lib.ocr_arpa_load.restype = ctypes.c_void_p
            lib.ocr_arpa_load.argtypes = [ctypes.c_char_p]
            lib.ocr_arpa_free.argtypes = [ctypes.c_void_p]
            lib.ocr_arpa_order.argtypes = [ctypes.c_void_p]
            lib.ocr_arpa_order.restype = ctypes.c_int
            lib.ocr_arpa_token_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.ocr_arpa_token_id.restype = ctypes.c_int32
            lib.ocr_arpa_score.restype = ctypes.c_double
            lib.ocr_arpa_score.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.c_int32,
            ]
            lib._configured = True
        self._lib = lib
        self._handle = lib.ocr_arpa_load(str(arpa_path).encode())
        if not self._handle:
            raise FileNotFoundError(arpa_path)
        self.order = lib.ocr_arpa_order(self._handle)
        self._id_cache: dict[str, int] = {}

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.ocr_arpa_free(self._handle)
            self._handle = None

    def _tid(self, token: str) -> int:
        tid = self._id_cache.get(token)
        if tid is None:
            tid = self._lib.ocr_arpa_token_id(self._handle, token.encode())
            self._id_cache[token] = tid
        return tid

    def score(self, context: tuple[str, ...], token: str) -> float:
        ids = (ctypes.c_int32 * len(context))(
            *[self._tid(t) for t in context]
        )
        return self._lib.ocr_arpa_score(
            self._handle, ids, len(context), self._tid(token)
        )

    def make_score_fn(self, charset: list[str], add_blank: bool = True):
        """Same adapter as the Python ArpaLM (vocab +1 blank shift)."""
        tids = [
            self._tid(c) for c in charset
        ]

        def fn(prefix_ids: tuple[int, ...], next_id: int) -> float:
            shift = 1 if add_blank else 0
            ctx = (ctypes.c_int32 * len(prefix_ids))(
                *[tids[i - shift] for i in prefix_ids]
            )
            return self._lib.ocr_arpa_score(
                self._handle, ctx, len(prefix_ids), tids[next_id - shift]
            )

        return fn
