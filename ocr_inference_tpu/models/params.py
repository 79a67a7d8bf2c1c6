"""Model parameter lifecycle: init, save, load.

The reference's "checkpoints" are opaque ONNX files / torch .pth
(reference: BDRC/utils.py:1175-1187, model configs at utils.py:349-393).
Here parameters are Flax pytrees saved as msgpack (flax.serialization) with
a small JSON sidecar describing the architecture, so a model directory is
self-contained and reloadable without Python pickles.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def init_segmentation(model, patch_size: int = 512, seed: int = 0):
    """Initialize a segmentation model's variables for 512^2 RGB tiles."""
    x = jnp.zeros((1, patch_size, patch_size, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x, train=False)


def init_recognizer(model, input_height: int = 80, width: int = 256, seed: int = 0):
    """Initialize a recognizer's variables for (B, H, W) line batches."""
    x = jnp.zeros((1, input_height, width), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x, train=False)


def save_params(variables: Any, path: str | Path, meta: dict | None = None) -> None:
    """Serialize a variables pytree to <path> (msgpack) + <path>.json meta."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_vars = jax.tree.map(np.asarray, variables)
    path.write_bytes(serialization.to_bytes(host_vars))
    if meta is not None:
        Path(str(path) + ".json").write_text(
            json.dumps(meta, indent=2), encoding="utf-8"
        )


def load_params(template_variables: Any, path: str | Path) -> Any:
    """Load a msgpack checkpoint into the structure of template_variables."""
    data = Path(path).read_bytes()
    return serialization.from_bytes(template_variables, data)


def load_meta(path: str | Path) -> dict | None:
    meta_path = Path(str(path) + ".json")
    if meta_path.is_file():
        return json.loads(meta_path.read_text(encoding="utf-8"))
    return None


def param_count(variables: Any) -> int:
    leaves = jax.tree.leaves(variables)
    return int(sum(np.prod(l.shape) for l in leaves if hasattr(l, "shape")))
