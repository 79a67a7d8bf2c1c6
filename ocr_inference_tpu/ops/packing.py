"""Bit-packed binary mask transfer (device -> host).

Binary page masks are 1 bit of information per pixel; shipping them as
uint8 wastes 8x the bandwidth, and some TPU transports additionally have
slow uint8 readback paths. The device packs mask bits into int32 words
(packbits + bitcast) and the host unpacks with numpy — a 32x smaller,
word-aligned transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_mask(mask_bool: jax.Array) -> jax.Array:
    """(..., W) bool/0-1 -> (..., ceil(ceil(W/8)/4)) int32, big-bit-order
    within bytes (np.unpackbits-compatible), little-endian byte packing."""
    bits = mask_bool.astype(bool)
    packed = jnp.packbits(bits, axis=-1)  # uint8 (..., ceil(W/8))
    pad = (-packed.shape[-1]) % 4
    if pad:
        packed = jnp.pad(
            packed,
            [(0, 0)] * (packed.ndim - 1) + [(0, pad)],
        )
    grouped = packed.reshape(packed.shape[:-1] + (-1, 4))
    return jax.lax.bitcast_convert_type(grouped, jnp.int32)


def unpack_mask(packed_host: np.ndarray, width: int) -> np.ndarray:
    """Inverse of pack_mask on host: (..., n32) int32 -> (..., width) uint8
    with values 0/1."""
    arr = np.ascontiguousarray(packed_host)
    as_bytes = arr.view(np.uint8).reshape(arr.shape[:-1] + (arr.shape[-1] * 4,))
    bits = np.unpackbits(as_bytes, axis=-1)
    return bits[..., :width]
