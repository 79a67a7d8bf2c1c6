"""Page tiling / stitching and line-canvas padding.

Replaces the reference's NumPy split/stack tiling and aspect-preserving line
padding (reference: BDRC/utils.py:497-560, 713-778, 818-899) with pure
reshape/transpose XLA programs, plus host-side shape planning so every jitted
program sees static shapes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ocr_inference_tpu.ops.imaging import resize_bilinear


@dataclass(frozen=True)
class PagePlan:
    """Host-side static-shape plan for one page.

    Mirrors the reference's clamp/pad/tile decisions
    (reference: BDRC/utils.py:741-778) but precomputed so the device program
    has static shapes: resize to (resized_h, resized_w), pad to
    (padded_h, padded_w) with value 255, tile into (y_steps*x_steps) patches.
    """

    orig_h: int
    orig_w: int
    resized_h: int
    resized_w: int
    padded_h: int
    padded_w: int
    patch_size: int

    @property
    def pad_x(self) -> int:
        return self.padded_w - self.resized_w

    @property
    def pad_y(self) -> int:
        return self.padded_h - self.resized_h

    @property
    def x_steps(self) -> int:
        return self.padded_w // self.patch_size

    @property
    def y_steps(self) -> int:
        return self.padded_h // self.patch_size

    @property
    def n_tiles(self) -> int:
        return self.x_steps * self.y_steps


def plan_page(
    h: int,
    w: int,
    patch_size: int = 512,
    clamp_width: int = 4096,
    clamp_height: int = 2048,
    clamp_size: bool = True,
) -> PagePlan:
    """Reproduce the reference clamp rules (reference: BDRC/utils.py:764-776):
    wide pages clamp to clamp_width, tall pages to clamp_height, short pages
    upscale to patch_size height; then pad up to a multiple of patch_size."""
    rh, rw = h, w
    if clamp_size and w > h and w > clamp_width:
        scale = clamp_width / w
        rw, rh = clamp_width, int(h * scale)
    elif clamp_size and h > w and h > clamp_height:
        scale = clamp_height / h
        rh, rw = clamp_height, int(w * scale)
    elif h < patch_size:
        scale = patch_size / h
        rh, rw = patch_size, int(w * scale)

    ph = math.ceil(rh / patch_size) * patch_size
    pw = math.ceil(rw / patch_size) * patch_size
    return PagePlan(h, w, rh, rw, ph, pw, patch_size)


def preprocess_page(image: jax.Array, plan: PagePlan) -> jax.Array:
    """Resize per plan and pad bottom/right with 255
    (reference: BDRC/utils.py:741-778)."""
    img = image
    if (plan.resized_h, plan.resized_w) != (plan.orig_h, plan.orig_w):
        img = resize_bilinear(img, plan.resized_h, plan.resized_w)
    pad = ((0, plan.pad_y), (0, plan.pad_x)) + ((0, 0),) * (img.ndim - 2)
    return jnp.pad(img, pad, mode="constant", constant_values=255)


def tile_page(padded: jax.Array, patch_size: int = 512) -> jax.Array:
    """(H, W, C) -> (N, patch, patch, C) in row-major tile order, matching the
    reference's np.split order (reference: BDRC/utils.py:713-721)."""
    h, w = padded.shape[0], padded.shape[1]
    ys, xs = h // patch_size, w // patch_size
    c = padded.shape[2] if padded.ndim == 3 else 1
    x = padded.reshape(ys, patch_size, xs, patch_size, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(ys * xs, patch_size, patch_size, c)


def stitch_tiles(tiles: jax.Array, y_steps: int) -> jax.Array:
    """Inverse of tile_page: (N, p, p[, C]) -> (H, W[, C])
    (reference: BDRC/utils.py:724-729)."""
    n = tiles.shape[0]
    p = tiles.shape[1]
    x_steps = n // y_steps
    if tiles.ndim == 3:
        x = tiles.reshape(y_steps, x_steps, p, p)
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(y_steps * p, x_steps * p)
    c = tiles.shape[3]
    x = tiles.reshape(y_steps, x_steps, p, p, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(y_steps * p, x_steps * p, c)


def crop_padding(image: jax.Array, pad_x: int, pad_y: int) -> jax.Array:
    """Strip the bottom/right padding (reference: BDRC/utils.py:1100-1108)."""
    h = image.shape[0] - pad_y
    w = image.shape[1] - pad_x
    return image[:h, :w]


# ---------------------------------------------------------------------------
# Line canvas padding (recognizer input)
# ---------------------------------------------------------------------------

def pad_ocr_line(
    img: jax.Array,
    target_width: int = 3000,
    target_height: int = 80,
    padding: str = "black",
) -> jax.Array:
    """Aspect-preserving pad of a line strip into a fixed canvas
    (reference: BDRC/utils.py:818-899, BDRC/inference.py:313-334).

    Width-limited lines are resized to target_width and centered vertically;
    height-limited lines are resized to target_height and centered
    horizontally; padding value is black (0) or white (255). A final bilinear
    resize to the exact canvas mirrors the reference's belt-and-braces resize.
    """
    h, w = int(img.shape[0]), int(img.shape[1])
    c = int(img.shape[2]) if img.ndim == 3 else 1
    value = 255 if padding == "white" else 0

    width_ratio = target_width / w
    height_ratio = target_height / h

    if width_ratio <= height_ratio:
        # pad_to_width: resize to target_width, center vertically
        new_w = target_width
        new_h = int(h * (target_width / w))
        resized = resize_bilinear(img, new_h, new_w)
        middle = (target_height - new_h) // 2
        if middle < 0:
            resized = resized[:target_height]
            new_h, middle = target_height, 0
        pad_top, pad_bot = middle, target_height - new_h - middle
        pads = ((pad_top, pad_bot), (0, 0)) + ((0, 0),) * (img.ndim - 2)
    else:
        # pad_to_height: resize to target_height, center horizontally
        new_h = target_height
        new_w = int(w * (target_height / h))
        resized = resize_bilinear(img, new_h, new_w)
        middle = (target_width - new_w) // 2
        if middle < 0:
            resized = resized[:, :target_width]
            new_w, middle = target_width, 0
        pad_left, pad_right = middle, target_width - new_w - middle
        pads = ((0, 0), (pad_left, pad_right)) + ((0, 0),) * (img.ndim - 2)

    out = jnp.pad(resized, pads, mode="constant", constant_values=value)
    if out.shape[0] != target_height or out.shape[1] != target_width:
        out = resize_bilinear(out, target_height, target_width)
    return out


def pre_pad_line(img: np.ndarray) -> np.ndarray:
    """Host-side: add HxH white squares left+right of a line strip
    (reference: BDRC/inference.py:349-357). Host numpy because line strips
    are variable-shaped until bucketed."""
    h = img.shape[0]
    c = img.shape[2] if img.ndim == 3 else 1
    patch = np.full((h, h, c) if img.ndim == 3 else (h, h), 255, dtype=np.uint8)
    return np.hstack([patch, img, patch])


def bucket_for_width(
    w: int, h: int, target_height: int, buckets: tuple[int, ...]
) -> int:
    """Pick the smallest width bucket that fits the line once scaled to
    target_height. New (no reference equivalent): the reference pads every
    line to the full model width; bucketing avoids running 3000-px compute
    on short lines."""
    scaled_w = max(1, int(w * (target_height / max(h, 1))))
    for b in buckets:
        if scaled_w <= b:
            return b
    return buckets[-1]
