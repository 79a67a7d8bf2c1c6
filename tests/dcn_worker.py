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
  CLIs use on multi-host slices).

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

    result = {
        "loss": loss,
        "fingerprint": fingerprint,
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
