"""Worker process for the two-process DCN dryrun (test_distributed_dcn.py).

Each worker joins a ``jax.distributed`` cluster over localhost (the DCN
process boundary SURVEY §5.8 requires for multi-host v5e slices — here on
CPU devices, which is exactly what a cross-host mesh looks like minus the
transport), builds ONE global mesh spanning both processes, and runs:

- one data-parallel training step (training.make_train_step) on a global
  batch assembled from per-process local shards
  (``jax.make_array_from_process_local_data``), gradients psummed across
  the process boundary;
- ``host_shard`` input partitioning (the per-host page split the batch
  CLIs use on multi-host slices);
- a 2-process INFERENCE sweep (round-4, VERDICT r3 item 9): synthetic pages
  host-sharded across the processes, each process running the full
  detect/geometry/recognize pipeline data-parallel over its LOCAL devices
  (the real multi-host serving layout — page parallelism across hosts, DP
  within each host), per-page line counts allgathered across the process
  boundary so every process sees the global result.

Writes a JSON result for the parent test to cross-check against the
single-process oracle. Run with:
  JAX_COORDINATOR_ADDRESS=localhost:<port> JAX_NUM_PROCESSES=2
  JAX_PROCESS_ID=<i> JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=4
  (and PALLAS_AXON_POOL_IPS unset, so the experimental TPU relay plugin
  never registers in the worker.)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def _page(seed: int, n_lines: int = 4, h: int = 600, w: int = 1200,
          line_h: int = 28) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 235, dtype=np.uint8)
    step = h // (n_lines + 1)
    for i in range(n_lines):
        y0 = step * (i + 1)
        img[y0 : y0 + line_h, 60 : w - 60] = rng.integers(
            20, 70, size=(line_h, w - 120, 3)
        )
    return img


def _tiny_pipeline(mesh):
    """Deterministic random-weight pipeline (the test_dp_inference fixture
    shape): a density detector whose masks are functional despite random
    weights, plus a seeded Easter2 recognizer."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ocr_inference_tpu.core.data import (
        BatchConfig, CharsetEncoder, OCRModelConfig,
    )
    from ocr_inference_tpu.models import Easter2
    from ocr_inference_tpu.models.params import init_recognizer
    from ocr_inference_tpu.pipeline import (
        OCRPipeline, RecognitionEngine, SegmentationEngine,
    )

    class DensityLineModel(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            dark = 1.0 - jnp.mean(x, axis=-1, keepdims=True)
            density = nn.avg_pool(
                dark, (9, 41), strides=(1, 1), padding="SAME"
            )
            return (density - 0.35) * 40.0

    det_model = DensityLineModel()
    det_vars = det_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)), train=False
    )
    det = SegmentationEngine(
        det_model, det_vars, mode="line", tile_chunk=8, mesh=mesh
    )
    charset = list("abcdefghijklmnopqrstuvwxyz'§/ ")
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=2000,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=charset, add_blank=True, version="test",
    )
    rec_model = Easter2(vocab_size=len(charset) + 1, dtype=jnp.float32)
    rec_vars = init_recognizer(rec_model, 80, 256)
    rec = RecognitionEngine(
        rec_model, rec_vars, cfg,
        batch_cfg=BatchConfig(
            width_buckets=(512, 1024), max_lines_per_batch=16
        ),
        mesh=mesh,
    )
    return OCRPipeline(rec, det)


def main(out_path: str) -> None:
    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache(
        os.environ.get(
            "OCR_TEST_COMPILE_CACHE",
            os.path.expanduser("~/.cache/ocr_tpu_xla_tests"),
        )
    )

    from ocr_inference_tpu.parallel.mesh import (
        DATA_AXIS,
        distributed_init,
        host_shard,
        make_mesh,
        replicated,
    )

    distributed_init()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocr_inference_tpu.models import Easter2
    from ocr_inference_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
        synthetic_ctc_batch,
    )

    devices = jax.devices()
    mesh = make_mesh(devices=devices)

    model = Easter2(vocab_size=16, dtype=jnp.float32)
    optimizer = make_optimizer(total_steps=4)
    state = init_train_state(model, optimizer, input_height=32, width=64)
    rep = replicated(mesh)
    state.params = jax.device_put(state.params, rep)
    state.batch_stats = jax.device_put(state.batch_stats, rep)
    state.opt_state = jax.device_put(state.opt_state, rep)

    step = make_train_step(model, optimizer, mesh)
    batch = synthetic_ctc_batch(batch_size=8, height=32, width=64, vocab=16)

    pi, pc = jax.process_index(), jax.process_count()

    def to_global(x: np.ndarray):
        """Global batch-sharded array from this process's local rows."""
        shd = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        rows = x.shape[0] // pc
        local = x[pi * rows : (pi + 1) * rows]
        return jax.make_array_from_process_local_data(shd, local, x.shape)

    gbatch = {k: to_global(v) for k, v in batch.items()}
    (params2, _, _, step_no), loss = step(state.as_tuple(), gbatch)
    loss = float(loss)  # replicated -> addressable on every process

    # a global param fingerprint proves the update ran and is identical
    # across processes (the parent compares both workers' values)
    fingerprint = float(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(params2))
    )

    # -- inference sweep (VERDICT r3 item 9): pages host-sharded across the
    # processes, the full pipeline data-parallel over this process's LOCAL
    # devices, per-page line counts allgathered across the DCN boundary.
    from jax.experimental import multihost_utils

    from ocr_inference_tpu.core.data import OpStatus

    n_pages = 4
    pages = [_page(100 + i) for i in range(n_pages)]
    my_pages = host_shard(list(range(n_pages)))
    local_mesh = make_mesh(devices=jax.local_devices())
    pipeline = _tiny_pipeline(local_mesh)
    texts: dict[int, list[str]] = {}
    counts = np.zeros((n_pages,), np.int32)
    for i in my_pages:
        status, payload = pipeline.run_ocr(pages[i])
        assert status == OpStatus.SUCCESS, payload
        _, _, ocr_lines, _ = payload
        texts[i] = [l.text for l in ocr_lines]
        counts[i] = len(ocr_lines)
    # cross-process gather: every process ends up with the GLOBAL per-page
    # line counts (non-local pages contribute zeros locally)
    gathered = np.asarray(multihost_utils.process_allgather(counts))
    global_counts = gathered.reshape(pc, n_pages).sum(axis=0)

    result = {
        "loss": loss,
        "fingerprint": fingerprint,
        "inference": {
            "pages": my_pages,
            "texts": {str(i): t for i, t in texts.items()},
            "global_line_counts": [int(c) for c in global_counts],
        },
        "step_no": int(step_no),
        "process_index": pi,
        "process_count": pc,
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh_shape": dict(mesh.shape),
        "host_shard": host_shard(list(range(10))),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"worker {pi}/{pc} OK loss={loss:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1])
