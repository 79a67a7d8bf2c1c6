"""Segmentation networks: UNet (line detection) and DeepLabV3+ (layout).

The reference runs these as ONNX graphs over 512x512 tiles — a binary line
mask model (reference: BDRC/inference.py:166-183) and a 5-class layout model
(reference: BDRC/inference.py:186-276), plus a torch DeepLabV3Plus for modern
book layout (reference: BDRC/utils.py:1175-1187). Here they are native Flax
modules; trained or ONNX-imported weights both load into the same interface.

I/O convention: NHWC float input in [0, 1]; output NHWC logits (no
sigmoid/softmax — activation lives in the pipeline so thresholding fuses).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ocr_inference_tpu.models.layers import (
    ASPP,
    ConvBN,
    ResidualBlock,
    resize_feature,
    upsample2x,
)

Dtype = Any


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b), lossless pixel regrouping."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)


class UNet(nn.Module):
    """Compact UNet for binary line segmentation over 512x512 tiles.

    Flagship line-detection net ("PhotiLines"-class capability). Four
    down/up levels; skip connections by concat.

    ``stem_stride=2`` selects the TPU-first variant: a lossless
    space-to-depth stem regroups the tile to (256, 256, 12) so the whole
    encoder/decoder runs one octave lower (~4x fewer FLOPs — the full-res
    level both dominates FLOPs and underfills the 128-lane MXU at w=32),
    then a light full-resolution refinement stage (depth-to-space of the
    decoder output concatenated with stem features) restores pixel-accurate
    mask edges. Accuracy is gated by the end-to-end synthetic CER loop
    (bocr-selftrain), not assumed — see docs/PERFORMANCE.md.
    """

    classes: int = 1
    width: int = 32
    stem_stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = x.astype(self.dtype)

        stem = None
        if self.stem_stride > 1:
            stem = ConvBN(w // 2, dtype=self.dtype)(x, train)  # full-res feats
            x = space_to_depth(x, self.stem_stride)

        skips = []
        feats = [w, w * 2, w * 4, w * 8]
        for f in feats:
            x = ConvBN(f, dtype=self.dtype)(x, train)
            x = ConvBN(f, dtype=self.dtype)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = ConvBN(w * 16, dtype=self.dtype)(x, train)
        x = ConvBN(w * 16, dtype=self.dtype)(x, train)

        for f, skip in zip(reversed(feats), reversed(skips)):
            x = upsample2x(x)
            x = nn.Conv(f, (2, 2), padding="SAME", dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBN(f, dtype=self.dtype)(x, train)
            x = ConvBN(f, dtype=self.dtype)(x, train)

        if stem is not None:
            s = self.stem_stride
            while s > 1:  # power-of-two stride -> log2(s) upsamples
                x = upsample2x(x)
                s //= 2
            x = jnp.concatenate([x, stem], axis=-1)
            x = ConvBN(w // 2, dtype=self.dtype)(x, train)

        logits = nn.Conv(self.classes, (1, 1), dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return logits


class ResNetEncoder(nn.Module):
    """Small ResNet encoder producing stride-4 (low) and stride-16 (high)
    feature maps for DeepLabV3+."""

    widths: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.widths[0], (7, 7), strides=(2, 2), dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # stride 4
        for _ in range(self.blocks_per_stage):
            x = ResidualBlock(self.widths[0], dtype=self.dtype)(x, train)
        low = x  # stride 4
        for i, f in enumerate(self.widths[1:]):
            stride = (2, 2)
            x = ResidualBlock(f, strides=stride, dtype=self.dtype)(x, train)
            for _ in range(self.blocks_per_stage - 1):
                x = ResidualBlock(f, dtype=self.dtype)(x, train)
        return low, x  # stride 4, stride 32


class DeepLabV3Plus(nn.Module):
    """DeepLabV3+ for multi-class layout segmentation (background, image,
    line, caption, margin — reference: cli.py:59-65; and modern-book classes
    — reference: BDRC/inference.py:860-961)."""

    classes: int = 5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        low, high = ResNetEncoder(dtype=self.dtype)(x, train)
        y = ASPP(256, dtype=self.dtype)(high, train)
        y = resize_feature(y, low.shape[1], low.shape[2])
        low = ConvBN(48, (1, 1), dtype=self.dtype)(low, train)
        y = jnp.concatenate([y, low], axis=-1)
        y = ConvBN(256, dtype=self.dtype)(y, train)
        y = ConvBN(256, dtype=self.dtype)(y, train)
        logits = nn.Conv(self.classes, (1, 1), dtype=jnp.float32)(
            y.astype(jnp.float32)
        )
        return resize_feature(logits, h, w)
