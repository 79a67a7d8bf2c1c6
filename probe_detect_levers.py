"""Quantify the named detect-MFU levers (companion to probe_detect.py).

probe_detect.json showed the width-32 stem2 UNet is HBM-bound (54% of
peak bandwidth, 4x lane-padding on 32-channel tensors). This probe times
the two named redesigns at the same tile batch — stride-4 space-to-depth
stem (one more octave down; channels 48+) and width-64 (half the lane
padding) — with RANDOM weights: a pure cost measurement of the lever,
explicitly NOT an accuracy claim (either variant needs the selftrain
accuracy gate before it could become the flagship).

Run: python probe_detect_levers.py [--out artifacts/bench_r5_session/probe_detect_levers.json]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()

    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocr_inference_tpu.models import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.random((args.batch, 512, 512, 3), np.float32), jnp.float32
    )

    def timed(fn):
        r = fn(x)
        float(jnp.sum(r))
        per = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(x)
            float(jnp.sum(r))
            per.append((time.perf_counter() - t0) / args.iters * 1000)
        return statistics.median(per)

    def cost(model, params):
        c = (
            jax.jit(lambda t: model.apply(params, t, train=False))
            .lower(x)
            .compile()
            .cost_analysis()
        )
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))

    out = {"batch": args.batch, "variants": {}}
    for name, kw in (
        ("flagship_w32_s2", dict(width=32, stem_stride=2)),
        ("w32_s4", dict(width=32, stem_stride=4)),
        ("w64_s2", dict(width=64, stem_stride=2)),
        ("w64_s4", dict(width=64, stem_stride=4)),
    ):
        model = UNet(classes=1, dtype=jnp.bfloat16, **kw)
        params = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        fwd = jax.jit(lambda v, t: model.apply(v, t, train=False))
        ms = timed(lambda t: fwd(params, t))
        flops, bytes_ = cost(model, params)
        out["variants"][name] = {
            "ms": round(ms, 2),
            "gflops": round(flops / 1e9, 1),
            "hbm_gb": round(bytes_ / 1e9, 3),
            "mfu_pct": round(
                flops / (ms / 1e3) / (PEAK_BF16_TFLOPS * 1e12) * 100, 2
            ),
            "hbm_util_pct": round(
                bytes_ / (ms / 1e3) / (PEAK_HBM_GBPS * 1e9) * 100, 2
            ),
        }
        print(name, out["variants"][name], flush=True)

    print(json.dumps(out, indent=1))
    if args.out:
        import os

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
