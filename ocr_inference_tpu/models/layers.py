"""Shared Flax building blocks for the OCR networks.

The reference executes opaque ONNX graphs (reference: BDRC/inference.py:128,
294); here the architectures are first-class Flax modules designed for the
TPU: channels-last NHWC so XLA tiles convs onto the MXU, bfloat16 compute
with float32 params/statistics, and static shapes throughout.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dilation: tuple[int, int] = (1, 1)
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SqueezeExcite1D(nn.Module):
    """Squeeze-and-excitation over a (B, T, C) sequence (global context
    gating used by Easter2's blocks)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
        s = nn.Dense(max(self.features // 8, 8), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.features, dtype=self.dtype)(s)
        s = jax.nn.sigmoid(s)
        return x * s


class ConvBN1D(nn.Module):
    """Conv1D + BatchNorm + activation over (B, T, C)."""

    features: int
    kernel: int = 3
    strides: int = 1
    dilation: int = 1
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel,),
            strides=(self.strides,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ResidualBlock(nn.Module):
    """Two 3x3 ConvBN with identity/projection shortcut (ResNet basic)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, strides=self.strides, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, act=None, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=self.strides,
                use_bias=False,
                dtype=self.dtype,
            )(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(
                residual
            )
        return nn.relu(y + residual)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3 head)."""

    features: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [ConvBN(self.features, (1, 1), dtype=self.dtype)(x, train)]
        for r in self.rates:
            branches.append(
                ConvBN(self.features, (3, 3), dilation=(r, r), dtype=self.dtype)(
                    x, train
                )
            )
        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.features, (1, 1), dtype=self.dtype)(pooled, train)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.features)
        )
        branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, (1, 1), dtype=self.dtype)(y, train)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample (static-shape, cheap on TPU)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def resize_feature(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear feature-map resize to (h, w)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")
