"""CTC fine-tuning CLI for the line recognizers.

New capability over the reference (which ships no training code,
SURVEY §5.4). Trains/fine-tunes a recognizer on a directory of line
images + transcription labels, data-parallel over all available chips,
and writes framework-native msgpack weights a model dir can consume.

Dataset layout: <data>/<stem>.png|jpg + <data>/<stem>.txt (Unicode labels,
converted through the model's charset encoder).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from glob import glob

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Fine-tune a CTC line recognizer"
    )
    parser.add_argument("--model", required=True,
                        help="OCR model directory (model_config.json)")
    parser.add_argument("--data", required=True,
                        help="Directory of line images + .txt labels")
    parser.add_argument("--output", required=True,
                        help="Output weights path (.msgpack)")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--width", type=int, default=1024,
                        help="Training canvas width (bucket)")
    parser.add_argument("--from-scratch", action="store_true",
                        help="Ignore existing weights")
    parser.add_argument("--log-every", type=int, default=50)
    return parser.parse_args(argv)


def load_dataset(data_dir: str, config, width: int):
    """Load line images + labels into fixed arrays (host)."""
    import cv2

    from ocr_inference_tpu.core.data import CharsetEncoder
    from ocr_inference_tpu.pipeline.engines import pad_ocr_line_host
    from ocr_inference_tpu.text import StackEncoder, WylieEncoder

    encoder = (
        StackEncoder(config.charset)
        if config.encoder == CharsetEncoder.STACK
        else WylieEncoder(config.charset)
    )
    images, labels = [], []
    for img_path in sorted(glob(os.path.join(data_dir, "*"))):
        if not img_path.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        label_path = os.path.splitext(img_path)[0] + ".txt"
        if not os.path.isfile(label_path):
            continue
        img = cv2.imread(img_path)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        canvas = pad_ocr_line_host(img, width, config.input_height)
        gray = cv2.cvtColor(canvas, cv2.COLOR_RGB2GRAY)
        images.append(gray.astype(np.float32) / 127.5 - 1.0)
        label = encoder.read_label(label_path)
        ids = [i for i in encoder.encode(label) if i > 0]
        labels.append(ids)
    if not images:
        raise SystemExit(f"no image/label pairs under {data_dir}")
    max_label = max(len(l) for l in labels)
    label_arr = np.zeros((len(labels), max_label), np.int32)
    length_arr = np.zeros((len(labels),), np.int32)
    for i, ids in enumerate(labels):
        label_arr[i, : len(ids)] = ids
        length_arr[i] = len(ids)
    return np.stack(images), label_arr, length_arr


def main(argv=None):
    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)

    import jax

    from ocr_inference_tpu.core.assets import read_ocr_model_config
    from ocr_inference_tpu.models import build_recognizer
    from ocr_inference_tpu.models.params import (
        init_recognizer,
        load_params,
        save_params,
    )
    from ocr_inference_tpu.parallel import make_mesh
    from ocr_inference_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    import jax.numpy as jnp

    config = read_ocr_model_config(
        os.path.join(args.model, "model_config.json")
    )
    vocab_size = len(config.charset) + (1 if config.add_blank else 0)
    model = build_recognizer(config.architecture, vocab_size, dtype=jnp.float32)

    images, labels, label_lengths = load_dataset(args.data, config, args.width)
    n = len(images)
    print(f"dataset: {n} lines, canvas {config.input_height}x{args.width}, "
          f"vocab {vocab_size}")

    optimizer = make_optimizer(args.lr, total_steps=args.steps)
    state = init_train_state(
        model, optimizer, config.input_height, args.width
    )
    weights_in = os.path.join(args.model, "weights.msgpack")
    if not args.from_scratch and os.path.isfile(weights_in):
        variables = load_params(
            {"params": state.params, "batch_stats": state.batch_stats},
            weights_in,
        )
        state.params = variables["params"]
        state.batch_stats = variables["batch_stats"]
        print(f"resumed from {weights_in}")

    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    step_fn = make_train_step(model, optimizer, mesh)
    print(f"training on {n_dev} device(s)")

    rng = np.random.default_rng(0)
    state_t = state.as_tuple()
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, n, size=args.batch_size)
        batch = {
            "images": images[idx],
            "image_widths": np.full((args.batch_size,), args.width, np.int32),
            "labels": labels[idx],
            "label_lengths": label_lengths[idx],
        }
        state_t, loss = step_fn(state_t, batch)
        if step % args.log_every == 0 or step == args.steps:
            rate = step * args.batch_size / (time.time() - t0)
            print(f"step {step}/{args.steps} loss {float(loss):.4f} "
                  f"({rate:.1f} lines/s)")

    params, batch_stats, _, _ = state_t
    save_params(
        {"params": params, "batch_stats": batch_stats},
        args.output,
        meta={
            "architecture": config.architecture,
            "vocab_size": vocab_size,
            "input_height": config.input_height,
            "trained_steps": args.steps,
        },
    )
    print(f"saved weights to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
