"""Regenerate the reference-pipeline differential fixture weights.

Trains the REDUCED synthetic stack (Easter2 width_mult=0.25/stem 64 at an
80x320 line canvas; UNet width=8) on the small-world synthetic
distribution used by tests/test_reference_pipeline.py, and writes the
weights to tests/data/refpipe/.

The fixture is committed so the differential suite (reference pipeline
code vs this framework on the same checkpoints) runs in seconds; re-run
this script to reproduce or refresh it:

    python tests/make_refpipe_fixture.py            # TPU or default device
    JAX_PLATFORMS=cpu python tests/make_refpipe_fixture.py   # CPU (slow)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

# the small-world config shared with tests/test_reference_pipeline.py
CANVAS = 320
INPUT_H = 80
GLYPH_H = 40
N_SYLLABLES = (2, 4)
SYLLABLE_LEN = (1, 3)
WIDTH_MULT = 0.25
STEM = 64
UNET_WIDTH = 8
REC_STEPS = 4000
REC_BATCH = 16
# pool size bounds memorization: 64 batches (1k strips) trains to zero loss
# but 37% held-out CER; 384 batches (6k strips) forces per-glyph learning
REC_POOL = 384
SEG_STEPS = 400
SEG_BATCH = 8
SEG_POOL = 32
SEED = 7

OUT = Path(__file__).parent / "data" / "refpipe"


def main() -> int:
    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ocr_inference_tpu.decode.ctc import greedy_decode, ids_to_tokens
    from ocr_inference_tpu.eval.cer import cer
    from ocr_inference_tpu.eval.synthetic import (
        WYLIE_CHARSET, GlyphSet, recognizer_batch, segmentation_batch,
    )
    from ocr_inference_tpu.models import UNet, build_recognizer
    from ocr_inference_tpu.models.params import save_params
    from ocr_inference_tpu.training import (
        init_seg_train_state, init_train_state, make_optimizer,
        make_seg_train_step, make_train_step,
    )

    OUT.mkdir(parents=True, exist_ok=True)
    charset = WYLIE_CHARSET
    vocab = len(charset) + 1
    glyphs = GlyphSet(height=GLYPH_H, seed=7)
    rng = np.random.RandomState(SEED)
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log(f"device: {jax.devices()[0].platform}")

    # ---- recognizer ---------------------------------------------------
    t0 = time.perf_counter()
    pool = [
        recognizer_batch(
            rng, glyphs, charset, REC_BATCH, input_height=INPUT_H,
            width=CANVAS, n_syllables=N_SYLLABLES, syllable_len=SYLLABLE_LEN,
        )
        for _ in range(REC_POOL)
    ]
    log(f"[rec] {REC_POOL} batches generated in {time.perf_counter()-t0:.0f}s")

    model = build_recognizer(
        "Easter2", vocab, width_mult=WIDTH_MULT, stem_features=STEM
    )
    opt = make_optimizer(1e-3, total_steps=REC_STEPS,
                         warmup_steps=REC_STEPS // 10)
    state = init_train_state(
        model, opt, input_height=INPUT_H, width=CANVAS, seed=0
    ).as_tuple()
    step = make_train_step(model, opt)
    t0 = time.perf_counter()
    for i in range(REC_STEPS):
        state, loss = step(state, pool[i % REC_POOL])
        if (i + 1) % 250 == 0:
            log(f"[rec] {i+1}/{REC_STEPS} loss {float(loss):.4f} "
                f"({time.perf_counter()-t0:.0f}s)")
    rec_vars = {"params": state[0], "batch_stats": state[1]}
    save_params(
        rec_vars, OUT / "recognizer.msgpack",
        meta={"architecture": "Easter2", "charset": list(charset),
              "width_mult": WIDTH_MULT, "stem_features": STEM,
              "input_width": CANVAS, "input_height": INPUT_H},
    )

    # held-out strip CER as the fixture quality gate
    er = np.random.RandomState(999)
    b = recognizer_batch(
        er, glyphs, charset, 32, input_height=INPUT_H, width=CANVAS,
        n_syllables=N_SYLLABLES, syllable_len=SYLLABLE_LEN,
    )
    logits = model.apply(rec_vars, jnp.asarray(b["images"]), train=False)
    ids, lengths, _ = (np.asarray(x) for x in greedy_decode(logits))
    preds = ["".join(ids_to_tokens(ids[j], int(lengths[j]), charset, True))
             for j in range(ids.shape[0])]
    refs = ["".join(charset[t - 1] for t in row[row > 0])
            for row in np.asarray(b["labels"])]
    strip_cer = cer(preds, refs)
    log(f"[rec] held-out strip CER {strip_cer:.4f}")

    # ---- line-detection UNet -----------------------------------------
    t0 = time.perf_counter()
    spool = [
        segmentation_batch(rng, glyphs, charset, SEG_BATCH)
        for _ in range(SEG_POOL)
    ]
    log(f"[seg] {SEG_POOL} batches generated in {time.perf_counter()-t0:.0f}s")
    seg_model = UNet(classes=1, width=UNET_WIDTH)
    sopt = make_optimizer(1e-3, total_steps=SEG_STEPS,
                          warmup_steps=SEG_STEPS // 10)
    sstate = init_seg_train_state(
        seg_model, sopt, patch_size=512, seed=0
    ).as_tuple()
    sstep = make_seg_train_step(seg_model, sopt)
    t0 = time.perf_counter()
    for i in range(SEG_STEPS):
        sstate, loss = sstep(sstate, spool[i % SEG_POOL])
        if (i + 1) % 100 == 0:
            log(f"[seg] {i+1}/{SEG_STEPS} loss {float(loss):.4f} "
                f"({time.perf_counter()-t0:.0f}s)")
    save_params(
        {"params": sstate[0], "batch_stats": sstate[1]},
        OUT / "lines.msgpack",
        meta={"architecture": "unet", "width": UNET_WIDTH},
    )
    log(f"[done] fixture in {OUT} (strip CER {strip_cer:.4f})")
    print(strip_cer)
    return 0


if __name__ == "__main__":
    sys.exit(main())
