"""Device mesh runtime: data/model-parallel sharding for batch OCR.

The reference has no multi-device execution at all (SURVEY §2.3: DataLoader
workers and one GPU are its only parallelism). This module is the TPU-native
equivalent: a ``jax.sharding.Mesh`` spanning ICI within a slice (and DCN
across hosts via ``jax.distributed``), with NamedSharding annotations on
batches and parameters; XLA inserts the collectives.

Axes:
- ``data``  — pages / tiles / line batches (the dominant axis for OCR
              inference; BASELINE config 5's multi-volume sweep);
- ``model`` — optional tensor-parallel axis for wide recognizer heads
              (large stack charsets) and the training step.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init() -> None:
    """Multi-host init (jax.distributed), no-op when single-host or already
    initialized. Controlled by the standard JAX cluster env vars:
    ``JAX_COORDINATOR_ADDRESS`` (host:port) plus — outside the managed
    launchers jax auto-detects (SLURM/TPU pods) — ``JAX_NUM_PROCESSES`` and
    ``JAX_PROCESS_ID``. Exercised cross-process by
    tests/test_distributed_dcn.py (two localhost processes, CPU devices),
    the SURVEY §5.8 multi-host path a single-host sandbox can reach."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return
    kwargs = {}
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
    backend: Optional[str] = None,
) -> Mesh:
    """Build a (data, model) mesh over the given/available devices.

    ``model_parallel`` devices per model group; the rest go to data
    parallelism. Defaults to all local devices and model_parallel=1 (pure
    DP — correct for the small OCR nets).
    """
    if devices is None:
        devices = (
            jax.local_devices(backend=backend) if backend else jax.devices()
        )
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} mesh devices, only {len(devices)} "
                f"available ({[str(d) for d in devices]})"
            )
        devices = devices[:n_devices]
    devices = list(devices)
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    dp = n // model_parallel
    mesh_devices = np.array(devices).reshape(dp, model_parallel)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _first_dict_key(path) -> Optional[str]:
    """The first mapping key along a pytree path — i.e. the top-level module
    name inside a flax param dict, skipping namedtuple/sequence wrappers
    (optimizer-state containers)."""
    for entry in path:
        if hasattr(entry, "key"):  # DictKey
            return str(entry.key)
    return None


def tp_shardings(mesh: Mesh, tree: Any, head_module: str = "Conv_0") -> Any:
    """Sharding tree for tensor-parallel recognizer heads.

    Leaves whose top-level param-dict module is ``head_module`` (the final
    vocab-width conv of Easter2 — matched by PATH, never by dimension size,
    so hidden layers that happen to share the vocab width, or same-named
    convs nested inside other blocks, are never sharded accidentally) get
    their last dim split over the model axis when it divides evenly;
    everything else is replicated. Works on params and optimizer-state trees
    alike: optax moments mirror the param dict inside namedtuple wrappers,
    which ``_first_dict_key`` skips. Pass the params/batch_stats/opt_state
    subtrees directly, not a surrounding ``{"params": ...}`` dict.
    """
    tp = mesh.shape[MODEL_AXIS]

    def leaf_fn(path, leaf):
        in_head = _first_dict_key(path) == head_module
        if (
            tp > 1
            and in_head
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[-1] % tp == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
            )
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(leaf_fn, tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, np.ndim(x)) if np.ndim(x) else replicated(mesh)
        ),
        batch,
    )


def replicate_params(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), params)


def shard_params_tp(
    mesh: Mesh, variables: Any, head_module: str = "Conv_0"
) -> Any:
    """Place a flax variables dict (``{"params": ..., "batch_stats": ...}``)
    on the mesh tensor-parallel: the recognizer head's leaves are split over
    the model axis (``tp_shardings``), everything else replicated. XLA then
    partitions the vocab-width head matmul across the model axis and
    all-gathers logits only where a replicated output is demanded. With
    ``model_parallel=1`` this is plain replication."""
    shardings = {
        col: tp_shardings(mesh, sub, head_module)
        for col, sub in variables.items()
    }
    return {
        col: jax.device_put(variables[col], shardings[col])
        for col in variables
    }


def pad_to_multiple_of(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the batch dim so it divides the data axis; returns (padded, n_pad)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, 0
    pad = np.zeros((rem,) + batch.shape[1:], batch.dtype)
    return np.concatenate([batch, pad]), rem


def host_shard(items: Sequence, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> list:
    """Per-host input sharding: host i takes items i, i+P, i+2P, ...

    Used by the batch CLIs on multi-host slices so each host reads only its
    share of pages (SURVEY §5.8).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])


class DataParallelRunner:
    """Run a per-example device function over a mesh-sharded batch.

    Wraps ``fn(params, batch) -> out`` with jit + shardings: params
    replicated, batch/outputs sharded on the data axis. The host-side
    ``__call__`` pads the batch to a multiple of the data-axis size and
    strips the padding from outputs.
    """

    def __init__(self, mesh: Mesh, fn: Callable):
        self.mesh = mesh
        self._dp = mesh.shape[DATA_AXIS]
        in_shardings = (
            replicated(mesh),
            NamedSharding(mesh, P(DATA_AXIS)),
        )
        self._jitted = jax.jit(
            fn,
            in_shardings=in_shardings,
            out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
        )

    def __call__(self, params: Any, batch: np.ndarray):
        padded, n_pad = pad_to_multiple_of(np.asarray(batch), self._dp)
        out = self._jitted(params, padded)
        if n_pad:
            out = jax.tree.map(lambda x: x[: batch.shape[0]], out)
        return out
