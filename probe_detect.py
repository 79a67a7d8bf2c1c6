"""Detect-forward decomposition probe (VERDICT r4 item 4).

Measures the flagship stem2 UNet's forward cost per tile batch on the real
chip and attributes it: achieved FLOP/s vs bf16 peak (MFU), achieved HBM
bytes/s vs peak, and a dtype A/B (bf16 vs f32) — deciding whether the
7.4% detect MFU of BENCH_r04 is an MXU-utilization bound (conv widths far
below the 128-lane MXU), an HBM bound, or dispatch overhead.

Methodology (axon-safe, CLAUDE.md): timings are N-iteration slopes with a
value readback at the end of each window (`block_until_ready` does not wait
for remote execution over the relay); medians across windows. FLOPs/bytes
come from XLA's own cost analysis of the compiled executable.

Run: python probe_detect.py [--out artifacts/bench_r5_session/probe_detect.json]
(one TPU process at a time — do not run concurrently with training/bench).
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


# v5e (lite) public peaks
PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.0
PEAK_HBM_GBPS = 819.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocr_inference_tpu.models import UNet

    dev = jax.devices()[0]
    out: dict = {"device": str(dev), "platform": dev.platform}

    rng = np.random.default_rng(0)

    def timed_slope(fn, x, iters, windows):
        """Median per-call ms from N-iteration windows, readback-fenced."""
        r = fn(x)
        float(jnp.sum(r))  # warm + fence
        per_call = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(x)
            float(jnp.sum(r))
            per_call.append((time.perf_counter() - t0) / iters * 1000)
        return statistics.median(per_call)

    def cost(fn, x):
        c = jax.jit(fn).lower(x).compile().cost_analysis()
        if isinstance(c, list):  # older jax returns [dict]
            c = c[0]
        return float(c.get("flops", 0.0)), float(
            c.get("bytes accessed", 0.0)
        )

    results = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model = UNet(classes=1, stem_stride=2, dtype=dtype)
        x0 = jnp.asarray(
            rng.random((8, 512, 512, 3), np.float32), jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), x0, train=False)
        fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))

        per_b = {}
        for b in (8, 16, 24, 32):
            x = jnp.asarray(
                rng.random((b, 512, 512, 3), np.float32), jnp.float32
            )
            fn = lambda t: fwd(params, t)  # noqa: E731
            ms = timed_slope(fn, x, args.iters, args.windows)
            flops, bytes_ = cost(lambda t: model.apply(params, t, train=False), x)
            peak = PEAK_BF16_TFLOPS if name == "bf16" else PEAK_F32_TFLOPS
            per_b[f"b{b}"] = {
                "ms": round(ms, 2),
                "gflops": round(flops / 1e9, 1),
                "hbm_gb": round(bytes_ / 1e9, 3),
                "mfu_pct": round(flops / (ms / 1e3) / (peak * 1e12) * 100, 2),
                "hbm_util_pct": round(
                    bytes_ / (ms / 1e3) / (PEAK_HBM_GBPS * 1e9) * 100, 2
                ),
            }
        # marginal cost of 8 extra tiles at the b24 working point
        per_b["marginal_16_to_24_ms"] = round(
            (per_b["b24"]["ms"] - per_b["b16"]["ms"]), 2
        )
        per_b["marginal_24_to_32_ms"] = round(
            (per_b["b32"]["ms"] - per_b["b24"]["ms"]), 2
        )
        results[name] = per_b

    out["stem2_forward"] = results

    # verdict: which wall is the b24 bf16 point against?
    b24 = results["bf16"]["b24"]
    walls = {
        "mxu": b24["mfu_pct"],
        "hbm": b24["hbm_util_pct"],
    }
    bound = max(walls, key=walls.get)
    out["attribution"] = {
        "b24_bf16": b24,
        "nearest_wall": bound,
        "nearest_wall_util_pct": walls[bound],
        "note": (
            "util% of the nearest hardware wall; if both are low the "
            "forward is overhead/serialization-bound (layer mix of "
            "narrow-channel convs, pools, concats that XLA cannot tile "
            "onto the 128x128 MXU)"
        ),
    }

    print(json.dumps(out, indent=1))
    if args.out:
        import os

        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
