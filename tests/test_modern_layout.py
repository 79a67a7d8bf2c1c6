"""ModernBookFormat layout path test with a deterministic layout model."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ocr_inference_tpu.core.data import LayoutDetectionConfig
from ocr_inference_tpu.pipeline import ModernBookFormatLayoutDetection
from ocr_inference_tpu.pipeline.engines import SegmentationEngine

CLASSES = ["background", "header", "footer"]


class BandLayoutModel(nn.Module):
    """Classifies dark pixels in the top band as header, bottom as footer."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.shape[1]
        dark = 1.0 - jnp.mean(x, axis=-1)
        rows = jnp.arange(h)[None, :, None] / h
        header = jnp.where((rows < 0.3) & (dark > 0.3), 8.0, -8.0)
        footer = jnp.where((rows > 0.7) & (dark > 0.3), 8.0, -8.0)
        background = jnp.full_like(header, 0.0)
        return jnp.stack([background, header, footer], axis=-1)


def test_modern_layout_writes_json(tmp_path):
    import cv2

    pages = tmp_path / "pages"
    out = tmp_path / "out"
    pages.mkdir()
    img = np.full((512, 512, 3), 240, np.uint8)
    img[30:60, 100:400] = 30      # header band
    img[460:490, 100:400] = 30    # footer band
    cv2.imwrite(str(pages / "p1.png"), img)

    model = BandLayoutModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    engine = SegmentationEngine(
        model, variables, mode="layout", classes=CLASSES, tile_chunk=4
    )
    config = LayoutDetectionConfig("", "", "deeplabv3", 512, CLASSES)
    det = ModernBookFormatLayoutDetection(config, engine=engine)

    results = det.run(str(pages), str(out), filter_classes=["header", "footer"])
    rec = json.loads((out / "p1.json").read_text())
    assert set(rec) == {"header", "footer"}
    hb = rec["header"]["bbox"]
    assert hb["y"] < 100 and hb["w"] >= 290
    fb = rec["footer"]["bbox"]
    assert fb["y"] > 400


def test_modern_layout_validates_filter_classes(tmp_path):
    model = BandLayoutModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    engine = SegmentationEngine(
        model, variables, mode="layout", classes=CLASSES
    )
    config = LayoutDetectionConfig("", "", "deeplabv3", 512, CLASSES)
    det = ModernBookFormatLayoutDetection(config, engine=engine)
    import pytest

    with pytest.raises(ValueError, match="not part of the model's classes"):
        det.run(str(tmp_path), str(tmp_path), filter_classes=["sidebar"])
