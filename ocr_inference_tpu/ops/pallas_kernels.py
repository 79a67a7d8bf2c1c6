"""Pallas TPU kernels for the hot image-preprocessing ops.

The adaptive Gaussian binarization (block 51, C 13) runs on every page tile
and every recognizer line canvas (reference: BDRC/utils.py:796-815 via cv2).
The XLA path (ops.imaging.binarize) lowers to two conv calls + elementwise;
these Pallas kernels fuse the whole thing — separable 51-tap blur as banded
matmuls on the MXU, rounding, threshold — into one VMEM-resident pass,
eliminating the intermediate HBM round-trips.

The banded-matmul formulation: blurring rows by a K-tap kernel equals
``L @ X`` where L is the (H, H) band matrix of kernel taps with
edge-replicated boundary rows folded in; blurring columns is ``X @ R``.
Both are dense matmuls — exactly what the MXU wants.

Two kernels:

- ``binarize_tiles_pallas``: (N, 512, 512, 3) detection tiles; one whole
  tile per kernel invocation (both band matrices fit VMEM).
- ``binarize_lines_pallas``: (B, H, W) recognizer line canvases with W up
  to 3000 — a (W, W) band matrix would not fit VMEM, so the page is cut
  into overlapping column windows in XLA (replicate-padded by the 25-tap
  half-width) and the kernel runs on a (lines, windows) grid with a small
  shift-invariant (Bw+50, Bw) column matrix shared by every window.

Production gating (``pallas_enabled``): Mosaic compiles through the
experimental axon tunnel can hang for tens of minutes (see CLAUDE.md), so
the TPU path is enabled only after ``probe_pallas()`` has succeeded once in
a bounded SUBPROCESS and dropped a marker next to the persistent XLA cache;
on CPU backends the kernels run in interpret mode (used by the test suite
for bit-parity against the XLA path).
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ocr_inference_tpu.ops.imaging import gaussian_kernel_1d

_BLOCK = 51
_C = 13.0
_HALF = _BLOCK // 2


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


@functools.lru_cache(maxsize=None)
def _shift_matrix(block_w: int, ksize: int) -> np.ndarray:
    """(block_w + ksize - 1, block_w) column-blur matrix for interior
    windows whose replicate border was folded in by an XLA pre-pad:
    out[:, t] = sum_u taps[u] * window[:, t + u]."""
    k = gaussian_kernel_1d(ksize, 0.0).astype(np.float64)
    m = np.zeros((block_w + ksize - 1, block_w), np.float64)
    for t in range(block_w):
        m[t : t + ksize, t] = k
    return m.astype(np.float32)


def _binarize_kernel(gray_ref, lmat_ref, rmat_ref, out_ref):
    """One (H, W) float32 gray tile -> (H, W) float32 binary mask (0/255).

    Channel mixing (grayscale) stays in XLA where the (H, W, 3) uint8
    layout is handled well; the kernel fuses the expensive part: the
    two banded MXU matmuls of the separable blur plus round/threshold,
    with no intermediate HBM traffic.
    """
    gray = gray_ref[...]
    # HIGHEST precision: the MXU's default f32 emulation loses ~1 ulp, which
    # flips knife-edge pixels after round(). At HIGHEST both kernels are
    # bit-exact against cv2 on the real chip — closer to the reference than
    # the on-TPU XLA conv path they replace (which drops ~0.03% of pixels)
    blurred = jnp.dot(lmat_ref[...], gray, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    blurred = jnp.dot(blurred, rmat_ref[...], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    mean_u8 = jnp.clip(jnp.round(blurred), 0.0, 255.0)
    out_ref[...] = jnp.where(gray > mean_u8 - _C, 255.0, 0.0)


def _line_window_kernel(win_ref, lmat_ref, rmat_ref, out_ref):
    """One (H, Bw+50) replicate-padded column window of one line canvas ->
    (H, Bw) binary block. Row blur = L @ win; column blur = @ R_shift."""
    win = win_ref[0, 0]
    blurred = jnp.dot(lmat_ref[...], win, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    blurred = jnp.dot(blurred, rmat_ref[...], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    mean_u8 = jnp.clip(jnp.round(blurred), 0.0, 255.0)
    center = win[:, _HALF : _HALF + out_ref.shape[-1]]
    out_ref[0, 0] = jnp.where(center > mean_u8 - _C, 255.0, 0.0)


def _on_tpu() -> bool:
    """Is compute landing on a real TPU? The axon plugin ignores
    JAX_PLATFORMS (CLAUDE.md), so an explicitly pinned jax_default_device
    (how this repo forces CPU) wins over default_backend()."""
    pinned = jax.config.jax_default_device
    if pinned is not None:
        return pinned.platform == "tpu"
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    """Interpret mode everywhere but a real TPU backend (CPU test meshes)."""
    return not _on_tpu()


@functools.partial(jax.jit, static_argnames=("block_size", "c"))
def binarize_tile_pallas(
    tile: jax.Array, block_size: int = _BLOCK, c: float = _C
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
    gray = (
        rgb_to_gray(tile).astype(jnp.float32)
        if tile.ndim == 3
        else tile.astype(jnp.float32)
    )
    out = pl.pallas_call(
        _binarize_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(gray, lmat, rmat)
    return out.astype(jnp.uint8)


def binarize_tiles_pallas(tiles: jax.Array) -> jax.Array:
    """vmap of the fused kernel over a tile batch (N, H, W, 3) -> (N, H, W)."""
    return jax.vmap(binarize_tile_pallas)(tiles)


def _window_block(width: int, target: int = 512) -> int:
    """Largest divisor of width not exceeding target (window width must tile
    the canvas exactly)."""
    for bw in range(min(target, width), 0, -1):
        if width % bw == 0:
            return bw
    return width


def line_kernel_applicable(height: int, width: int) -> bool:
    """The windowed kernel needs a sane block decomposition; tiny or
    prime-width canvases fall back to the XLA path."""
    return height >= 8 and width >= 128 and _window_block(width) >= 128


@functools.partial(jax.jit, static_argnames=())
def binarize_lines_pallas(gray: jax.Array) -> jax.Array:
    """Fused adaptive binarization of line canvases (B, H, W) uint8 gray ->
    (B, H, W) uint8 mask (0/255), bit-exact with
    imaging.adaptive_threshold_gaussian (51/13).

    The W axis is processed in overlapping windows: XLA materializes the
    (B, nb, H, Bw+50) replicate-padded window stack (one fused gather, ~10%
    extra HBM read), then a (B, nb) Pallas grid does the two MXU matmuls and
    threshold per window with no other intermediate traffic.
    """
    b, h, w = gray.shape
    bw = _window_block(w)
    nb = w // bw
    g = gray.astype(jnp.float32)
    gpad = jnp.pad(g, ((0, 0), (0, 0), (_HALF, _HALF)), mode="edge")
    windows = jnp.stack(
        [gpad[:, :, j * bw : j * bw + bw + 2 * _HALF] for j in range(nb)],
        axis=1,
    )  # (B, nb, H, bw+50)
    lmat = jnp.asarray(_band_matrix(h, _BLOCK))
    rmat = jnp.asarray(_shift_matrix(bw, _BLOCK))
    out = pl.pallas_call(
        _line_window_kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, h, bw + 2 * _HALF), lambda i, j: (i, j, 0, 0)
            ),
            pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            pl.BlockSpec((bw + 2 * _HALF, bw), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, bw), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, h, bw), jnp.float32),
        interpret=_interpret(),
    )(windows, lmat, rmat)
    return (
        jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w).astype(jnp.uint8)
    )


# ---------------------------------------------------------------------------
# Production gating
# ---------------------------------------------------------------------------

def _marker_path() -> Path:
    cache = Path(
        os.environ.get(
            "OCR_TPU_CACHE", str(Path.home() / ".cache" / "ocr_tpu_xla")
        )
    )
    return cache / f"pallas_ok_{jax.__version__}"


def pallas_enabled() -> bool:
    """Should production engines run the Pallas path?

    ``OCR_PALLAS=1`` forces on (interpret mode off-TPU — how the test suite
    exercises parity), ``OCR_PALLAS=0`` forces off. Default (``auto``): on
    only for TPU backends where ``probe_pallas`` has recorded a successful
    real compile — interpret mode is slower than the XLA path, so CPU
    backends default off, and an unprobed tunnel-attached TPU defaults off
    because a Mosaic compile may hang (CLAUDE.md).
    """
    mode = os.environ.get("OCR_PALLAS", "auto").lower()
    if mode in ("1", "true", "on"):
        return True
    if mode in ("0", "false", "off"):
        return False
    return _on_tpu() and _marker_path().is_file()


def probe_pallas(timeout_s: float = 900.0) -> bool:
    """Attempt one real-TPU Pallas compile in a bounded subprocess.

    Mosaic compiles through the axon tunnel can hang (CLAUDE.md); running
    the probe out-of-process means a hang costs ``timeout_s`` once, and a
    success persists both in the XLA compilation cache and as a marker file
    that flips ``pallas_enabled()`` to True for every later process.
    """
    marker = _marker_path()
    if marker.is_file():
        return True
    if not _on_tpu():
        return False
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "from ocr_inference_tpu.utils import enable_compilation_cache\n"
        "enable_compilation_cache()\n"
        "from ocr_inference_tpu.ops import pallas_kernels as pk\n"
        "t = jnp.asarray(np.zeros((512, 512, 3), np.uint8))\n"
        "jax.block_until_ready(pk.binarize_tile_pallas(t))\n"
        "g = jnp.asarray(np.zeros((4, 80, 512), np.uint8))\n"
        "jax.block_until_ready(pk.binarize_lines_pallas(g))\n"
        "print('PALLAS_OK')\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    if proc.returncode == 0 and "PALLAS_OK" in proc.stdout:
        marker.parent.mkdir(parents=True, exist_ok=True)
        marker.write_text("ok")
        return True
    return False


def pallas_supported() -> bool:
    """True when the current default backend can run these kernels now
    (marker present on TPU; interpret mode elsewhere always works)."""
    if not _on_tpu():
        return True
    return _marker_path().is_file()
