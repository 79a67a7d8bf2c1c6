"""Pallas TPU kernels for the hot image-preprocessing ops.

The adaptive Gaussian binarization (block 51, C 13) runs on every page tile
and every recognizer line canvas (reference: BDRC/utils.py:796-815 via cv2).
The XLA path (ops.imaging.binarize) lowers to two conv calls + elementwise;
this Pallas kernel fuses the whole thing — grayscale, separable 51-tap blur
as two banded matmuls on the MXU, rounding, threshold — into one VMEM-resident
pass per 512x512 tile, eliminating the intermediate HBM round-trips.

The banded-matmul formulation: blurring rows by a K-tap kernel equals
``L @ X`` where L is the (H, H) band matrix of kernel taps with
edge-replicated boundary rows folded in; blurring columns is ``X @ R``.
Both are dense (512, 512) matmuls — exactly what the MXU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocr_inference_tpu.ops.imaging import gaussian_kernel_1d


@functools.lru_cache(maxsize=None)
def _band_matrix(size: int, ksize: int, sigma: float = 0.0) -> np.ndarray:
    """(size, size) matrix L with L[i, j] = sum of kernel taps mapping source
    row j into blurred row i under BORDER_REPLICATE."""
    k = gaussian_kernel_1d(ksize, sigma).astype(np.float64)
    pad = ksize // 2
    m = np.zeros((size, size), np.float64)
    for i in range(size):
        for t in range(ksize):
            j = i + t - pad
            j = min(max(j, 0), size - 1)  # replicate border
            m[i, j] += k[t]
    return m.astype(np.float32)


def _binarize_kernel(gray_ref, lmat_ref, rmat_ref, out_ref):
    """One (H, W) float32 gray tile -> (H, W) float32 binary mask (0/255).

    Channel mixing (grayscale) stays in XLA where the (H, W, 3) uint8
    layout is handled well; the kernel fuses the expensive part: the
    two banded MXU matmuls of the separable blur plus round/threshold,
    with no intermediate HBM traffic.
    """
    gray = gray_ref[...]
    blurred = jnp.dot(lmat_ref[...], gray, preferred_element_type=jnp.float32)
    blurred = jnp.dot(blurred, rmat_ref[...], preferred_element_type=jnp.float32)
    mean_u8 = jnp.clip(jnp.round(blurred), 0.0, 255.0)
    out_ref[...] = jnp.where(gray > mean_u8 - 13.0, 255.0, 0.0)


@functools.partial(jax.jit, static_argnames=("block_size", "c"))
def binarize_tile_pallas(
    tile: jax.Array, block_size: int = 51, c: float = 13.0
) -> jax.Array:
    """Fused adaptive binarization of one (H, W, 3) uint8 tile -> (H, W)
    uint8 mask (values 0/255).

    Exact semantics of ops.imaging.binarize for tiles whose H and W are at
    least block_size (the band matrices fold the replicate border). The
    channel replication to 3 channels (cv2 API parity) is left to callers
    that need it.
    """
    from ocr_inference_tpu.ops.imaging import rgb_to_gray

    h, w = tile.shape[0], tile.shape[1]
    lmat = jnp.asarray(_band_matrix(h, block_size))
    rmat = jnp.asarray(_band_matrix(w, block_size).T)
    gray = rgb_to_gray(tile).astype(jnp.float32) if tile.ndim == 3 else tile
    out = pl.pallas_call(
        _binarize_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(gray, lmat, rmat)
    return out.astype(jnp.uint8)


def binarize_tiles_pallas(tiles: jax.Array) -> jax.Array:
    """vmap of the fused kernel over a tile batch (N, H, W, 3) -> (N, H, W)."""
    return jax.vmap(binarize_tile_pallas)(tiles)


def pallas_supported() -> bool:
    """True when the current default backend can run these kernels."""
    try:
        x = jnp.zeros((128, 128, 3), jnp.uint8)
        jax.block_until_ready(binarize_tile_pallas(x))
        return True
    except Exception:
        return False
