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
    """Tile every page/mask pair; returns (tiles, targets) arrays."""
    import cv2

    n_classes = max(1, len(classes)) if len(classes) > 1 else 1
    tiles, targets = [], []
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
            mask_path = base + "_mask.png"
            m = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
            if m is None:
                continue
            target = (m > 127).astype(np.float32)[..., None]
        else:
            target = np.zeros((h, w, n_classes), np.float32)
            found = False
            for ci, cname in enumerate(classes):
                m = cv2.imread(f"{base}_mask_{cname}.png",
                               cv2.IMREAD_GRAYSCALE)
                if m is not None:
                    target[..., ci] = m > 127
                    found = True
            if not found:
                continue
        ph = (h + patch_size - 1) // patch_size * patch_size
        pw = (w + patch_size - 1) // patch_size * patch_size
        img_p = np.full((ph, pw, 3), 255, np.uint8)
        img_p[:h, :w] = img
        tgt_p = np.zeros((ph, pw, target.shape[-1]), np.float32)
        tgt_p[:h, :w] = target
        for y in range(0, ph, patch_size):
            for x in range(0, pw, patch_size):
                tiles.append(
                    img_p[y : y + patch_size, x : x + patch_size].astype(
                        np.float32
                    )
                    / 255.0
                )
                targets.append(tgt_p[y : y + patch_size, x : x + patch_size])
    if not tiles:
        raise SystemExit(f"no page/mask pairs under {data_dir}")
    return np.stack(tiles), np.stack(targets)


def main(argv=None):
    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)

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
        batch = {"images": tiles[idx], "targets": targets[idx]}
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
