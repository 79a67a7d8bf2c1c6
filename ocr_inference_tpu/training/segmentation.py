"""Segmentation training for the detection models (new capability; the
reference ships inference only — SURVEY §5.4: "no training code").

Mirrors training/train.py's recognizer loop for the tile-based
segmentation nets (UNet / DeepLabV3+): per-pixel BCE + soft-dice loss over
(B, P, P, C) logits, the same TrainState/optimizer machinery, and a
pjit'd step over the data axis. Line models train with C=1 sigmoid
targets; layout models with C>1 one-hot targets (softmax cross-entropy).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ocr_inference_tpu.parallel.mesh import DATA_AXIS, replicated
from ocr_inference_tpu.training.train import TrainState


def seg_loss_fn(
    logits: jax.Array, targets: jax.Array, dice_weight: float = 1.0
) -> jax.Array:
    """Binary (C=1) or multi-class (C>1) segmentation loss.

    BCE/softmax-CE averaged per pixel plus a soft-dice term — the standard
    recipe for thin-structure masks (text lines), where plain CE
    under-weights the foreground.
    """
    c = logits.shape[-1]
    if c == 1:
        ce = optax.sigmoid_binary_cross_entropy(
            logits[..., 0], targets[..., 0]
        ).mean()
        probs = jax.nn.sigmoid(logits[..., 0])
        tgt = targets[..., 0]
    else:
        ce = optax.softmax_cross_entropy(logits, targets).mean()
        probs = jax.nn.softmax(logits, axis=-1)
        tgt = targets
    inter = (probs * tgt).sum()
    denom = probs.sum() + tgt.sum()
    dice = 1.0 - (2.0 * inter + 1.0) / (denom + 1.0)
    return ce + dice_weight * dice


def make_seg_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    dice_weight: float = 1.0,
    state_shardings: Any = None,
) -> Callable:
    """step(state_tuple, batch) -> (new_state_tuple, loss).

    batch: {"images": (B, P, P, 3) float32 in [0, 1],
            "targets": (B, P, P, C) float32}. With a mesh, batch shards on
    the data axis and state replicates; XLA inserts the gradient psum.
    """

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = model.apply(
            variables,
            batch["images"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        loss = seg_loss_fn(logits, batch["targets"], dice_weight)
        return loss, mutated["batch_stats"]

    def step(state_tuple, batch):
        params, batch_stats, opt_state, step_no = state_tuple
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_stats, new_opt_state, step_no + 1), loss

    if mesh is None:
        return jax.jit(step)

    batch_shardings = {
        "images": NamedSharding(mesh, P(DATA_AXIS, None, None, None)),
        "targets": NamedSharding(mesh, P(DATA_AXIS, None, None, None)),
    }
    rep = replicated(mesh)
    if state_shardings is None:
        state_shardings = (rep, rep, rep, rep)
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, rep),
    )


def init_seg_train_state(
    model, optimizer, patch_size: int = 512, seed: int = 0
) -> TrainState:
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, patch_size, patch_size, 3), jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state, 0)


def synthetic_seg_batch(
    batch_size: int, patch_size: int = 128, classes: int = 1, seed: int = 0
) -> dict:
    """Random tile batch with band-shaped targets for smoke tests."""
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (batch_size, patch_size, patch_size, 3))
    targets = np.zeros((batch_size, patch_size, patch_size, classes))
    for b in range(batch_size):
        y0 = rng.integers(0, patch_size - 16)
        targets[b, y0 : y0 + 12, :, rng.integers(0, classes)] = 1.0
        images[b, y0 : y0 + 12, :, :] *= 0.3
    return {
        "images": images.astype(np.float32),
        "targets": targets.astype(np.float32),
    }
