"""Import the reference implementation as a differential-testing oracle.

The reference at /root/reference is pure Python over cv2/numpy for the
geometry, image-op, exporter, and dewarp-analysis families tested here.
Its modules import a few heavyweight deps (onnxruntime,
segmentation_models_pytorch, pyewts, tps) that are absent in this
environment and IRRELEVANT to those families — they are stubbed at the
module level below, before the reference package is imported, with inert
placeholders that raise if actually exercised.

Everything exercised by tests/test_reference_diff.py runs the reference's
real code paths (cv2 + numpy), making it a true oracle for the rebuild's
hand-ported semantics.
"""

from __future__ import annotations

import sys
import types

import cv2
import numpy as np

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _InertClass:
    """Placeholder that raises on any use, so a stub can never silently
    stand in for real third-party behavior in a differential test."""

    def __init__(self, *a, **k):
        raise RuntimeError(
            f"{type(self).__name__} stub exercised — this differential "
            "family must not depend on stubbed third-party code"
        )


class _InferenceSession(_InertClass):
    pass


class _DeepLabV3Plus(_InertClass):
    pass


class _ThinPlateSpline(_InertClass):
    pass


class _pyewts:
    """Exporters only construct the converter; conversion itself is not on
    any differential path (reference: BDRC/exporter.py:40)."""

    def toUnicode(self, text):  # pragma: no cover - not on tested paths
        raise RuntimeError("pyewts stub exercised")

    def toWylie(self, text):  # pragma: no cover - not on tested paths
        raise RuntimeError("pyewts stub exercised")


def load_reference():
    """Stub missing deps, put the reference on sys.path, import its modules.

    Returns a namespace with the BDRC modules used as oracles.
    """
    _stub_module(
        "onnxruntime",
        get_available_providers=lambda: ["CPUExecutionProvider"],
        InferenceSession=_InferenceSession,
    )
    _stub_module("segmentation_models_pytorch", DeepLabV3Plus=_DeepLabV3Plus)
    _stub_module("tps", ThinPlateSpline=_ThinPlateSpline)
    _stub_module("pyewts", pyewts=_pyewts)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import BDRC.line_detection as ref_line_detection
    import BDRC.image_dewarping as ref_dewarping
    import BDRC.utils as ref_utils
    import BDRC.exporter as ref_exporter
    import BDRC.data as ref_data

    ns = types.SimpleNamespace(
        line_detection=ref_line_detection,
        dewarping=ref_dewarping,
        utils=ref_utils,
        exporter=ref_exporter,
        data=ref_data,
    )
    return ns


def load_reference_pipeline():
    """Import the reference's FULL pipeline (BDRC.inference.OCRPipeline)
    with this framework's FUNCTIONAL compat shims backing onnxruntime /
    pyctcdecode / pyewts / botok, so the reference's own code executes
    real checkpoints through the framework's graph executor and decoders
    (tests/test_reference_pipeline.py).

    Only genuinely-unused imports get inert stubs (torchvision and
    segmentation_models_pytorch feed the torch-CLI paths; tps feeds the
    dewarp path, not exercised by the differential pages).
    """
    # drop any previously imported reference modules so they re-bind
    # against the functional shims (earlier oracle families import some
    # BDRC modules under inert stubs)
    for name in list(sys.modules):
        if name == "BDRC" or name.startswith("BDRC.") or name == "Config":
            del sys.modules[name]
    for name in ("onnxruntime", "pyctcdecode", "pyctcdecode.decoder",
                 "pyewts", "botok"):
        sys.modules.pop(name, None)

    from ocr_inference_tpu import compat

    installed = compat.install(force=True)
    assert all(installed.values())

    _stub_module("segmentation_models_pytorch", DeepLabV3Plus=_DeepLabV3Plus)
    _stub_module("tps", ThinPlateSpline=_ThinPlateSpline)
    tv_image = types.ModuleType("torchvision.io.image")

    class _ImageReadMode:
        RGB = 3

    tv_image.ImageReadMode = _ImageReadMode
    tv_io = types.ModuleType("torchvision.io")
    tv_io.read_image = _InertClass
    tv_io.image = tv_image
    tv = types.ModuleType("torchvision")
    tv.io = tv_io
    for name, mod in (
        ("torchvision", tv),
        ("torchvision.io", tv_io),
        ("torchvision.io.image", tv_image),
    ):
        sys.modules.setdefault(name, mod)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import BDRC.data as ref_data
    import BDRC.inference as ref_inference

    return types.SimpleNamespace(inference=ref_inference, data=ref_data)


# ---------------------------------------------------------------------------
# Randomized fixtures: pecha-like pages and line masks
# ---------------------------------------------------------------------------

def random_line_mask(seed: int) -> np.ndarray:
    """A pecha-ish binary line mask: several horizontal text bands with
    varying thickness, slight waviness, random within-row gaps, and a few
    noise blobs. uint8 {0, 255}, 2-D."""
    rng = np.random.RandomState(seed)
    h = int(rng.randint(300, 700))
    w = int(rng.randint(700, 1400))
    mask = np.zeros((h, w), np.uint8)

    n_rows = int(rng.randint(3, 9))
    top = int(rng.randint(20, 60))
    usable = h - 2 * top
    row_pitch = max(usable // max(n_rows, 1), 24)
    for r in range(n_rows):
        y0 = top + r * row_pitch + int(rng.randint(-4, 5))
        thickness = int(rng.randint(14, min(34, row_pitch - 4)))
        x_start = int(rng.randint(20, 80))
        x_end = w - int(rng.randint(20, 80))
        amp = float(rng.uniform(0, 3.0))
        phase = float(rng.uniform(0, 2 * np.pi))
        xs = np.arange(x_start, x_end)
        ys = (y0 + amp * np.sin(xs / 180.0 * np.pi + phase)).astype(np.int32)
        for x, yc in zip(xs, ys):
            mask[max(yc, 0) : min(yc + thickness, h), x] = 255
        # punch a few gaps so rows split into chunks
        for _ in range(int(rng.randint(0, 3))):
            gx = int(rng.randint(x_start + 40, max(x_end - 40, x_start + 41)))
            gw = int(rng.randint(8, 30))
            mask[:, gx : gx + gw][mask[:, gx : gx + gw] > 0] = 0

    for _ in range(int(rng.randint(0, 4))):  # noise blobs
        bx = int(rng.randint(0, w - 8))
        by = int(rng.randint(0, h - 8))
        cv2.circle(mask, (bx + 4, by + 4), int(rng.randint(1, 4)), 255, -1)
    return mask


def random_page_image(seed: int, mask: np.ndarray | None = None) -> np.ndarray:
    """A page-like RGB image: light textured background, dark strokes where
    the mask is set (if given), occasional pure-black pixels so the
    np.delete interior-crop semantics get exercised."""
    rng = np.random.RandomState(seed + 10_000)
    if mask is None:
        h, w = int(rng.randint(200, 500)), int(rng.randint(400, 900))
    else:
        h, w = mask.shape[:2]
    img = rng.randint(185, 250, (h, w, 3)).astype(np.uint8)
    if mask is not None:
        ink = rng.randint(0, 70, (h, w, 3)).astype(np.uint8)
        sel = mask > 0
        img[sel] = ink[sel]
    # sprinkle exact-zero pixels (and a couple of zero columns) to exercise
    # the reference's interior row/col deletion semantics
    n_black = int(rng.randint(0, 40))
    ys = rng.randint(0, h, n_black)
    xs = rng.randint(0, w, n_black)
    img[ys, xs] = 0
    if rng.rand() < 0.3:
        img[:, int(rng.randint(0, w))] = 0
    if rng.rand() < 0.15:
        img[int(rng.randint(0, h)), :] = 0
    return img


def mask_to_contours(mask: np.ndarray, min_area: float = 10.0):
    contours, _ = cv2.findContours(
        mask, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    return [c for c in contours if cv2.contourArea(c) > min_area]
