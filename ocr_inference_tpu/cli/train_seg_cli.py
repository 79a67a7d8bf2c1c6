"""Segmentation training CLI: page/mask pairs -> detection model weights.

Counterpart of bocr-train for the detection side of the zoo (new
capability; the reference ships inference only). Dataset layout: a
directory of page images with sibling ``<name>_mask.png`` binary masks
(or ``<name>_mask_<class>.png`` per layout class). Pages are tiled into
patch_size squares (the inference geometry, ops/tiling.py) and batches
sample tiles uniformly; masks binarize at >127.

    bocr-train-seg --config line_model/config.json --data pages/ \
        --output unet.msgpack --steps 2000
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a line/layout segmentation model"
    )
    parser.add_argument("--config", required=True,
                        help="Line or layout model config JSON")
    parser.add_argument("--data", required=True,
                        help="Directory of page images + *_mask.png targets")
    parser.add_argument("--output", required=True,
                        help="Output weights path (.msgpack)")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--dice-weight", type=float, default=1.0)
    parser.add_argument("--log-every", type=int, default=50)
    return parser.parse_args(argv)


def load_tiles(data_dir: str, patch_size: int, classes: list[str]):
    """Tile every page/mask pair at INFERENCE geometry.

    Pages resize per the same plan_page clamp rules the detection engine
    applies (ops/tiling.py:60-84) so training scale matches inference
    scale, then pad-255 and tile. Tiles stay uint8 and targets uint8
    (normalized per sampled batch) so the dataset fits in host RAM. For
    multi-class configs a "background" class, if present, is derived as
    the complement of the union of the labeled masks — otherwise
    unlabeled pixels would carry all-zero softmax targets and contribute
    no loss."""
    import cv2

    from ocr_inference_tpu.ops.tiling import plan_page

    n_classes = max(1, len(classes)) if len(classes) > 1 else 1
    bg_idx = (
        classes.index("background")
        if n_classes > 1 and "background" in classes
        else None
    )
    tiles, targets = [], []

    def tile_one(arr, pad_value, plan, nearest=False):
        channels = arr.shape[2:]
        if (plan.resized_h, plan.resized_w) != (plan.orig_h, plan.orig_w):
            # masks resize NEAREST to stay binary
            arr = cv2.resize(
                arr, (plan.resized_w, plan.resized_h),
                interpolation=cv2.INTER_NEAREST if nearest
                else cv2.INTER_LINEAR,
            )
            arr = arr.reshape((plan.resized_h, plan.resized_w) + channels)
        shape = (plan.padded_h, plan.padded_w) + channels
        padded = np.full(shape, pad_value, arr.dtype)
        padded[: plan.resized_h, : plan.resized_w] = arr
        p = patch_size
        for y in range(0, plan.padded_h, p):
            for x in range(0, plan.padded_w, p):
                yield padded[y : y + p, x : x + p]

    for img_path in sorted(glob(os.path.join(data_dir, "*"))):
        base, ext = os.path.splitext(img_path)
        if ext.lower() not in (".jpg", ".jpeg", ".png") or base.endswith(
            "_mask"
        ) or "_mask_" in os.path.basename(base):
            continue
        img = cv2.imread(img_path)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        if n_classes == 1:
            m = cv2.imread(base + "_mask.png", cv2.IMREAD_GRAYSCALE)
            if m is None:
                continue
            target = (m > 127).astype(np.uint8)[..., None]
        else:
            target = np.zeros((h, w, n_classes), np.uint8)
            found = False
            for ci, cname in enumerate(classes):
                if ci == bg_idx:
                    continue
                m = cv2.imread(f"{base}_mask_{cname}.png",
                               cv2.IMREAD_GRAYSCALE)
                if m is not None:
                    target[..., ci] = m > 127
                    found = True
            if not found:
                continue
            if bg_idx is not None:
                target[..., bg_idx] = 1 - target.max(axis=-1)
        plan = plan_page(h, w, patch_size)
        for t in tile_one(img, 255, plan):
            tiles.append(t)
        for t in tile_one(target, 0, plan, nearest=True):
            targets.append(t)
    if not tiles:
        raise SystemExit(f"no page/mask pairs under {data_dir}")
    return np.stack(tiles), np.stack(targets)


def main(argv=None):
    args = parse_args(argv)  # before any jax/cache side effects: --help stays fast

    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ocr_inference_tpu.core.assets import (
        read_layout_model_config,
        read_line_model_config,
    )
    from ocr_inference_tpu.models import DeepLabV3Plus, UNet
    from ocr_inference_tpu.models.params import save_params
    from ocr_inference_tpu.parallel import make_mesh
    from ocr_inference_tpu.training import (
        init_seg_train_state,
        make_optimizer,
        make_seg_train_step,
    )

    try:
        config = read_layout_model_config(args.config)
    except Exception:
        config = read_line_model_config(args.config)
    classes = config.classes
    n_classes = len(classes) if len(classes) > 1 else 1
    arch = (config.architecture or "unet").lower()
    if "deeplab" in arch:
        model = DeepLabV3Plus(classes=n_classes, dtype=jnp.float32)
    else:
        model = UNet(classes=n_classes, dtype=jnp.float32)

    tiles, targets = load_tiles(args.data, config.patch_size, classes)
    n = len(tiles)
    print(f"dataset: {n} tiles of {config.patch_size}, {n_classes} class(es)")

    optimizer = make_optimizer(args.lr, total_steps=args.steps)
    state = init_seg_train_state(model, optimizer, config.patch_size)
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    step_fn = make_seg_train_step(model, optimizer, mesh,
                                  dice_weight=args.dice_weight)
    print(f"training on {n_dev} device(s)")

    rng = np.random.default_rng(0)
    state_t = state.as_tuple()
    for i in range(args.steps):
        idx = rng.integers(0, n, size=args.batch_size)
        # tiles/targets stored uint8; normalize per sampled batch
        batch = {
            "images": tiles[idx].astype(np.float32) / 255.0,
            "targets": targets[idx].astype(np.float32),
        }
        state_t, loss = step_fn(state_t, batch)
        if (i + 1) % args.log_every == 0 or i == 0:
            print(f"step {i + 1}/{args.steps} loss {float(loss):.4f}",
                  flush=True)

    params, batch_stats, _, _ = state_t
    save_params({"params": params, "batch_stats": batch_stats}, args.output)
    print(f"saved weights to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
