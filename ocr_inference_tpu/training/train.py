"""CTC fine-tuning for the recognizers (new capability; the reference ships
inference only — SURVEY §5.4: "no training code").

A compact but real training loop: optax CTC loss over (B, T, V) logits,
AdamW with cosine schedule, batch-stats handling for the BatchNorm trunks,
and a pjit'd train step over a (data, model) mesh — batch sharded on data,
parameters replicated (with the classifier head shardable on model for very
large stack charsets).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ocr_inference_tpu.parallel.mesh import DATA_AXIS, replicated


def ctc_loss_fn(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
    blank_id: int = 0,
) -> jax.Array:
    """Mean CTC loss; labels padded with 0 (the vocab blank convention:
    blank at index 0, charset ids +1)."""
    t = logits.shape[1]
    l = labels.shape[1]
    logit_pad = (
        jnp.arange(t)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    label_pad = (
        jnp.arange(l)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits, logit_pad, labels, label_pad, blank_id=blank_id
    )
    return jnp.mean(per_seq)


def make_optimizer(
    learning_rate: float = 3e-4,
    total_steps: int = 10_000,
    warmup_steps: int = 500,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


class TrainState:
    """Minimal train state pytree: params, batch_stats, opt_state, step."""

    def __init__(self, params, batch_stats, opt_state, step=0):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.step = step

    def as_tuple(self):
        return (self.params, self.batch_stats, self.opt_state, self.step)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    time_stride: int = 4,
    state_shardings: Any = None,
) -> Callable:
    """Build the jitted train step.

    step(state_tuple, batch) -> (new_state_tuple, loss); batch is a dict
    with images (B, H, W) float32 in [-1, 1], image_widths (B,), labels
    (B, L) int32, label_lengths (B,). With a mesh the step is pjit'd: batch
    sharded on the data axis, state replicated — XLA turns the gradient sum
    into a psum over ICI.
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
        logit_lengths = jnp.minimum(
            batch["image_widths"] // time_stride, logits.shape[1]
        )
        loss = ctc_loss_fn(
            logits, logit_lengths, batch["labels"], batch["label_lengths"]
        )
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
        "images": NamedSharding(mesh, P(DATA_AXIS, None, None)),
        "image_widths": NamedSharding(mesh, P(DATA_AXIS)),
        "labels": NamedSharding(mesh, P(DATA_AXIS, None)),
        "label_lengths": NamedSharding(mesh, P(DATA_AXIS)),
    }
    rep = replicated(mesh)
    if state_shardings is None:
        state_shardings = (rep, rep, rep, rep)
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, rep),
    )


def init_train_state(model, optimizer, input_height: int = 80,
                     width: int = 256, seed: int = 0) -> TrainState:
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, input_height, width), jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state, 0)


def synthetic_ctc_batch(
    batch_size: int, height: int, width: int, vocab: int, max_label: int = 32,
    seed: int = 0,
) -> dict:
    """Random batch for smoke tests / the multichip dry run."""
    rng = np.random.default_rng(seed)
    return {
        "images": rng.normal(size=(batch_size, height, width)).astype(np.float32),
        "image_widths": np.full((batch_size,), width, np.int32),
        "labels": rng.integers(
            1, vocab, size=(batch_size, max_label)
        ).astype(np.int32),
        "label_lengths": np.full((batch_size,), max_label // 2, np.int32),
    }
