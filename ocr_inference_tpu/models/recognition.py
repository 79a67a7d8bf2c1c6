"""Text line recognizers: Easter2 family and CRNN, as Flax modules.

The reference executes these as ONNX sessions — architectures named
Easter2 / Easter2b / Easter2-Attention / Easter2-Vit / CRNN
(reference: Config.py:71-77, BDRC/inference.py:279-429). Networks here are
native implementations of those families, TPU-shaped:

- input: a batch of line images (B, H, W) float32 in [-1, 1]
  (the reference's per-line normalization, BDRC/inference.py:336-347),
  H is the model's input_height (e.g. 80), W a static bucket width;
- the image is treated as a 1-D sequence along W; convs run along W on the
  MXU; total stride 4 gives T = W // 4 CTC time steps;
- output: (B, T, V) float32 logits, V = len(charset) + 1 with the CTC blank
  at index 0 (reference vocab convention: BDRC/inference.py:90-93).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ocr_inference_tpu.models.layers import ConvBN1D, SqueezeExcite1D

Dtype = Any


class Easter2Block(nn.Module):
    """Dense-residual 1-D conv block with squeeze-excite gating
    (Easter2.0-style: stacked Conv1D+BN with a gated global-context
    residual)."""

    features: int
    kernel: int
    repeats: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = nn.Conv(
            self.features, (1,), use_bias=False, dtype=self.dtype
        )(x)
        residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(
            residual
        )
        y = x
        for i in range(self.repeats):
            act = nn.relu if i < self.repeats - 1 else None
            y = ConvBN1D(
                self.features, kernel=self.kernel, act=act, dtype=self.dtype
            )(y, train)
            if self.dropout > 0 and i < self.repeats - 1:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = SqueezeExcite1D(self.features, dtype=self.dtype)(y)
        y = nn.relu(y + residual)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class MHSABlock(nn.Module):
    """Pre-norm multi-head self-attention + MLP over the (B, T, C) sequence
    (the Easter2-Attention / Easter2-Vit variants)."""

    features: int
    heads: int = 8
    dtype: Dtype = jnp.float32
    # torch checkpoints use eps=1e-5; flax defaults to 1e-6 — the weight
    # transplanter (onnx/transplant.py) refuses a mismatch, so imports
    # construct the module with the checkpoint's epsilon
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype)(x)
        y = nn.Dense(self.features * 4, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.features, dtype=self.dtype)(y)
        return x + y


class Easter2(nn.Module):
    """Easter2-family CTC recognizer.

    variant: "base" (Easter2/Easter2b) | "attention" | "vit" — the attention
    variants insert MHSA blocks after the conv trunk
    (reference architecture names: Config.py:71-77).

    SCOPE NOTE: this native module is a TPU-shaped (MXU-friendly widths,
    bf16) re-design for TRAINING FROM SCRATCH (training/train.py) — its
    layer dimensions are not, and are not meant to be, weight-compatible
    with the published BDRC Easter2 ``.onnx`` checkpoints. Published
    checkpoints run through the framework's own ONNX executor instead
    (ocr_inference_tpu.onnx; pipeline/builder.py prefers that path whenever
    a ``.onnx`` file is configured and no native msgpack weights exist),
    which is validated against exporter-style graphs and torch numerics in
    tests/test_onnx_golden.py.
    """

    vocab_size: int
    variant: str = "base"
    stem_features: int = 128
    # uniform channel-width scale for the conv trunk (tests and
    # resource-bounded deployments train reduced variants; 1.0 is the
    # published-architecture geometry)
    width_mult: float = 1.0
    dtype: Dtype = jnp.bfloat16
    ln_eps: float = 1e-6  # see MHSABlock.ln_eps

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, H, W) -> (B, W, H): width is the time axis, height the channels
        if x.ndim == 4:  # tolerate an explicit channel dim (B, 1, H, W)
            x = x.reshape(x.shape[0], x.shape[-2], x.shape[-1])
        x = jnp.transpose(x, (0, 2, 1)).astype(self.dtype)

        w256 = max(int(256 * self.width_mult), 8)
        w512 = max(int(512 * self.width_mult), 8)

        # stem: stride-4 downsample along width
        x = ConvBN1D(self.stem_features, kernel=3, strides=2, dtype=self.dtype)(
            x, train
        )
        x = ConvBN1D(self.stem_features, kernel=3, strides=2, dtype=self.dtype)(
            x, train
        )

        x = Easter2Block(w256, kernel=5, dtype=self.dtype)(x, train)
        x = Easter2Block(w256, kernel=7, dtype=self.dtype)(x, train)
        x = Easter2Block(w512, kernel=9, dtype=self.dtype)(x, train)

        if self.variant in ("attention", "vit"):
            depth = 2 if self.variant == "attention" else 4
            for _ in range(depth):
                x = MHSABlock(w512, dtype=self.dtype, ln_eps=self.ln_eps)(
                    x, train
                )

        x = ConvBN1D(w512, kernel=11, dilation=2, dtype=self.dtype)(x, train)
        x = ConvBN1D(w512, kernel=1, dtype=self.dtype)(x, train)
        logits = nn.Conv(self.vocab_size, (1,), dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return logits  # (B, W//4, V)


class CRNN(nn.Module):
    """CNN + bidirectional GRU CTC recognizer (reference architecture name
    "CRNN", Config.py:76). Conv stack collapses height; two BiGRU layers run
    as lax.scan over the width-major sequence."""

    vocab_size: int
    hidden: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:  # (B, H, W) -> NHWC
            x = x[..., None]
        elif x.ndim == 4 and x.shape[1] == 1:  # (B, 1, H, W) -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype)

        def conv(f, pool):
            def run(y, train):
                y = nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                            dtype=self.dtype)(y)
                y = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(y)
                y = nn.relu(y)
                if pool is not None:
                    y = nn.max_pool(y, pool, strides=pool)
                return y
            return run

        x = conv(64, (2, 2))(x, train)    # H/2,  W/2
        x = conv(128, (2, 2))(x, train)   # H/4,  W/4
        x = conv(256, (2, 1))(x, train)   # H/8,  W/4
        x = conv(256, (2, 1))(x, train)   # H/16, W/4
        x = conv(512, None)(x, train)

        # collapse remaining height into features: (B, W', H'*C)
        b, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, w, h * c)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)

        for _ in range(2):
            fwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype))
            # keep_order=True gives standard BiGRU alignment (the backward
            # pass's output at t summarizes the suffix from t), matching
            # torch nn.GRU(bidirectional=True) — pinned by the CRNN weight
            # transplant cross-validation in tests/test_transplant.py
            bwd = nn.RNN(
                nn.GRUCell(self.hidden, dtype=self.dtype),
                reverse=True, keep_order=True,
            )
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)

        logits = nn.Dense(self.vocab_size, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return logits  # (B, W//4, V)


def build_recognizer(architecture: str, vocab_size: int, dtype=jnp.bfloat16,
                     **kwargs):
    """Factory keyed by the reference architecture names
    (reference: Config.py:71-77). ``kwargs`` pass through to the module
    (e.g. ``width_mult``/``stem_features`` for reduced Easter2 variants,
    ``hidden`` for CRNN)."""
    arch = architecture.lower()
    if arch in ("easter2", "easter2b"):
        return Easter2(vocab_size=vocab_size, dtype=dtype, **kwargs)
    if arch == "easter2-attention":
        return Easter2(vocab_size=vocab_size, variant="attention",
                       dtype=dtype, **kwargs)
    if arch == "easter2-vit":
        return Easter2(vocab_size=vocab_size, variant="vit", dtype=dtype,
                       **kwargs)
    if arch == "crnn":
        return CRNN(vocab_size=vocab_size, dtype=dtype, **kwargs)
    raise ValueError(f"Unknown recognizer architecture: {architecture}")
