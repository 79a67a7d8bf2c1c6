"""Bit-packed binary mask transfer (device -> host).

Binary page masks are 1 bit of information per pixel; shipping them as
uint8 wastes 8x the bandwidth, and some TPU transports additionally have
slow uint8 readback paths. Both directions are covered:

- device -> host (detection output): ``pack_mask`` on device,
  ``unpack_mask`` on host;
- host -> device (binarized inputs): ``pack_bits_host`` on host,
  ``unpack_bits_device`` on device. The pipeline's network inputs are
  binarized pages/lines (reference: BDRC/utils.py:796-815,
  BDRC/inference.py:336-347), i.e. 1-bit images — uploading them packed
  is 8x less H2D traffic than uint8 gray.

Both pairs share the same layout (np.unpackbits bit order within bytes,
little-endian byte packing into int32 words), so either packer's output is
the other unpacker's input.
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


def pack_bits_host(bits: np.ndarray) -> np.ndarray:
    """Host twin of pack_mask: (..., W) bool/0-1 -> (..., n32) int32 for
    cheap H2D upload of binary images."""
    packed = np.packbits(np.asarray(bits).astype(bool), axis=-1)
    pad = (-packed.shape[-1]) % 4
    if pad:
        packed = np.pad(packed, [(0, 0)] * (packed.ndim - 1) + [(0, pad)])
    packed = np.ascontiguousarray(packed)
    return packed.view(np.int32)


def unpack_bits_device(packed: jax.Array, width: int) -> jax.Array:
    """Inverse of pack_bits_host on device: (..., n32) int32 -> (..., width)
    uint8 with values 0/1."""
    as_bytes = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (..., n32, 4)
    as_bytes = as_bytes.reshape(packed.shape[:-1] + (-1,))
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (as_bytes[..., None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(packed.shape[:-1] + (-1,))
    return bits[..., :width]


def unpack_mask(packed_host: np.ndarray, width: int) -> np.ndarray:
    """Inverse of pack_mask on host: (..., n32) int32 -> (..., width) uint8
    with values 0/1."""
    arr = np.ascontiguousarray(packed_host)
    as_bytes = arr.view(np.uint8).reshape(arr.shape[:-1] + (arr.shape[-1] * 4,))
    bits = np.unpackbits(as_bytes, axis=-1)
    return bits[..., :width]
