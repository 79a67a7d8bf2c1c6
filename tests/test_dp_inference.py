"""Data-parallel inference equivalence on the virtual 8-device CPU mesh.

BASELINE config 5's requirement: the same OCR pipeline, executed with its
batch dimensions sharded over a (data,) mesh, must produce the same output
as the single-device run (the reference has no multi-device execution at
all — SURVEY §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ocr_inference_tpu.core.data import (
    BatchConfig,
    CharsetEncoder,
    OCRModelConfig,
    OpStatus,
)
from ocr_inference_tpu.models import Easter2
from ocr_inference_tpu.models.params import init_recognizer
from ocr_inference_tpu.parallel import make_mesh
from ocr_inference_tpu.pipeline import (
    OCRPipeline,
    RecognitionEngine,
    SegmentationEngine,
    VolumeRunner,
)


class DensityLineModel(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        dark = 1.0 - jnp.mean(x, axis=-1, keepdims=True)
        density = nn.avg_pool(dark, (9, 41), strides=(1, 1), padding="SAME")
        return (density - 0.35) * 40.0


CHARSET = list("abcdefghijklmnopqrstuvwxyz'§/ ")


def _page(seed: int, n_lines=4, h=600, w=1200, line_h=28):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 235, dtype=np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        img[y0 : y0 + line_h, 60 : w - 60] = rng.integers(
            20, 70, size=(line_h, w - 120, 3)
        )
    return img


def _build_pipeline(mesh=None):
    det_model = DensityLineModel()
    det_vars = det_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)), train=False
    )
    det = SegmentationEngine(
        det_model, det_vars, mode="line", tile_chunk=8, mesh=mesh
    )
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=2000,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=CHARSET, add_blank=True, version="test",
    )
    rec_model = Easter2(vocab_size=len(CHARSET) + 1, dtype=jnp.float32)
    rec_vars = init_recognizer(rec_model, 80, 256)
    rec = RecognitionEngine(
        rec_model, rec_vars, cfg,
        batch_cfg=BatchConfig(width_buckets=(512, 1024), max_lines_per_batch=16),
        mesh=mesh,
    )
    return OCRPipeline(rec, det)


@pytest.fixture(scope="module")
def pipelines(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)
    return _build_pipeline(mesh=None), _build_pipeline(mesh=mesh)


def test_segmentation_mesh_matches_single(pipelines):
    single, meshed = pipelines
    img = _page(0)
    m1 = single.line_inference.predict(img)
    m8 = meshed.line_inference.predict(img)
    np.testing.assert_array_equal(m1, m8)


def test_recognition_mesh_matches_single(pipelines):
    single, meshed = pipelines
    rng = np.random.default_rng(3)
    lines = [
        rng.integers(0, 255, size=(40, int(w), 3), dtype=np.uint8)
        for w in [300, 700, 900, 450, 330]
    ]
    t1 = single.ocr_inference.run_batch(lines)
    t8 = meshed.ocr_inference.run_batch(lines)
    assert t1 == t8


def test_recognition_mesh_small_batch(pipelines):
    """A single line still runs when the batch must round up to the data-axis
    size (1 -> 8 with zero padding)."""
    _, meshed = pipelines
    line = np.random.default_rng(5).integers(0, 255, (40, 500, 3), np.uint8)
    out = meshed.ocr_inference.run_batch([line])
    assert len(out) == 1 and isinstance(out[0], str)


def test_recognition_tensor_parallel_matches_single(cpu_devices):
    """Tensor-parallel inference: on a (data=4, model=2) mesh the
    recognizer's vocab-width head conv is split over the model axis
    (parallel/mesh.py shard_params_tp; VERDICT r1 §2.3 TP row) and XLA
    partitions the head matmul — outputs must still equal the
    single-device run exactly."""
    from jax.sharding import PartitionSpec as P

    from ocr_inference_tpu.parallel import MODEL_AXIS

    charset = list("abcdefghijklmnopqrstuvwxyz'§/ 1")  # vocab 32, tp-even
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=512,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=charset, add_blank=True, version="test",
    )
    rec_model = Easter2(vocab_size=len(charset) + 1, dtype=jnp.float32)
    rec_vars = init_recognizer(rec_model, 80, 256)
    batch_cfg = BatchConfig(width_buckets=(512,), max_lines_per_batch=8)
    single = RecognitionEngine(rec_model, rec_vars, cfg, batch_cfg=batch_cfg)
    mesh_tp = make_mesh(devices=cpu_devices, model_parallel=2)
    meshed = RecognitionEngine(
        rec_model, rec_vars, cfg, batch_cfg=batch_cfg, mesh=mesh_tp
    )
    head = meshed.variables["params"]["Conv_0"]["kernel"]
    assert head.sharding.spec[-1] == MODEL_AXIS  # actually tensor-parallel

    rng = np.random.default_rng(9)
    lines = [
        rng.integers(0, 255, size=(40, int(w), 3), dtype=np.uint8)
        for w in [300, 420, 260, 380, 310]
    ]
    assert single.run_batch(lines) == meshed.run_batch(lines)


def test_volume_mesh_matches_single(pipelines):
    single, meshed = pipelines
    pages = [(f"p{i}", _page(i)) for i in range(3)]
    r1 = VolumeRunner(single, window_pages=2).run(pages)
    r8 = VolumeRunner(meshed, window_pages=2).run(pages)
    assert [r.status for r in r1] == [OpStatus.SUCCESS] * 3
    assert [r.status for r in r8] == [OpStatus.SUCCESS] * 3
    for a, b in zip(r1, r8):
        assert a.name == b.name
        np.testing.assert_array_equal(a.mask, b.mask)
        assert [o.text for o in a.ocr_lines] == [o.text for o in b.ocr_lines]
        assert [str(l.guid) != "" for l in a.lines]


def test_predict_many_mesh_matches_single(pipelines):
    """Many-pages-one-tensor detection under the mesh: the cross-page tile
    stream shards over the data axis and still equals per-page single-device
    masks exactly."""
    single, meshed = pipelines
    pages = [_page(10), _page(11, n_lines=3)]
    singles = [single.line_inference.predict(p) for p in pages]
    resolvers = meshed.line_inference.predict_many_async(pages)
    for want, resolve in zip(singles, resolvers):
        np.testing.assert_array_equal(resolve(), want)
