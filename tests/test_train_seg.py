"""Segmentation training: loss decreases, mesh step runs, CLI round-trips."""

import json

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ocr_inference_tpu.models import UNet
from ocr_inference_tpu.training import (
    init_seg_train_state,
    make_optimizer,
    make_seg_train_step,
    seg_loss_fn,
    synthetic_seg_batch,
)


def test_seg_loss_shapes():
    logits = jnp.zeros((2, 32, 32, 1))
    targets = jnp.zeros((2, 32, 32, 1))
    loss = seg_loss_fn(logits, targets)
    assert np.isfinite(float(loss))
    multi = seg_loss_fn(jnp.zeros((2, 16, 16, 4)), jnp.zeros((2, 16, 16, 4)))
    assert np.isfinite(float(multi))


def test_seg_training_reduces_loss():
    model = UNet(classes=1, width=8, dtype=jnp.float32)
    optimizer = make_optimizer(1e-3, total_steps=40, warmup_steps=2)
    state = init_seg_train_state(model, optimizer, patch_size=64)
    step = make_seg_train_step(model, optimizer)
    batch = synthetic_seg_batch(4, patch_size=64)
    state_t = state.as_tuple()
    losses = []
    for _ in range(12):
        state_t, loss = step(state_t, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_seg_training_mesh_step(cpu_devices):
    from ocr_inference_tpu.parallel import make_mesh

    mesh = make_mesh(devices=cpu_devices[:4])
    model = UNet(classes=1, width=8, dtype=jnp.float32)
    optimizer = make_optimizer(1e-3, total_steps=10, warmup_steps=1)
    state = init_seg_train_state(model, optimizer, patch_size=64)
    step = make_seg_train_step(model, optimizer, mesh)
    batch = synthetic_seg_batch(8, patch_size=64)
    state_t, loss = step(state.as_tuple(), batch)
    assert np.isfinite(float(loss))


def test_train_seg_cli_end_to_end(tmp_path):
    from ocr_inference_tpu.cli.train_seg_cli import main

    # tiny dataset: two pages with band masks
    for i in range(2):
        img = np.full((96, 160, 3), 230, np.uint8)
        mask = np.zeros((96, 160), np.uint8)
        img[40:52, 10:150] = 40
        mask[40:52, 10:150] = 255
        cv2.imwrite(str(tmp_path / f"p{i}.png"), img)
        cv2.imwrite(str(tmp_path / f"p{i}_mask.png"), mask)
    cfg = {
        "checkpoint": "seg.ckpt",
        "onnx-model": "seg.onnx",
        "architecture": "unet",
        "patch_size": 64,
        "classes": ["line"],
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    out = tmp_path / "weights.msgpack"
    rc = main([
        "--config", str(tmp_path / "config.json"),
        "--data", str(tmp_path),
        "--output", str(out),
        "--steps", "3",
        "--batch-size", "4",
    ])
    assert rc == 0
    assert out.is_file() and out.stat().st_size > 1000


def test_load_tiles_derives_background(tmp_path):
    from ocr_inference_tpu.cli.train_seg_cli import load_tiles

    img = np.full((64, 64, 3), 230, np.uint8)
    header = np.zeros((64, 64), np.uint8)
    header[5:15, :] = 255
    line = np.zeros((64, 64), np.uint8)
    line[30:40, :] = 255
    cv2.imwrite(str(tmp_path / "p.png"), img)
    cv2.imwrite(str(tmp_path / "p_mask_header.png"), header)
    cv2.imwrite(str(tmp_path / "p_mask_line.png"), line)

    tiles, targets = load_tiles(
        str(tmp_path), 64, ["background", "header", "line"]
    )
    assert tiles.dtype == np.uint8 and targets.dtype == np.uint8
    t = targets[0]
    # every pixel has exactly one class: background = complement
    assert (t.sum(axis=-1) == 1).all()
    assert t[10, 10, 1] == 1 and t[10, 10, 0] == 0   # header band
    assert t[35, 5, 2] == 1                           # line band
    assert t[50, 5, 0] == 1                           # unlabeled -> background
