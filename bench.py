"""Benchmark harness: end-to-end pages/sec on the flagship OCR pipeline.

Prints ONE JSON line:
  {"metric": "pages_per_sec_end_to_end", "value": N, "unit": "pages/s",
   "vs_baseline": R, ...}

Workload (BASELINE config 4 shape): a synthetic volume of pecha pages
(1600x2640, 6-10 sheared/jittered text lines each) through the full
pipeline — device detection
(UNet), host geometry, bucketed device recognition (Easter2) with on-device
greedy CTC, text conversion. Weights are random (the reference publishes no
benchmark numbers or weights; compute cost is architecture-shaped, not
weight-shaped).

Baseline: the reference is CPU-ONNXRuntime running the recognizer one line
per call (BDRC/inference.py:630-635). ONNXRuntime is not installable here,
so TWO stand-ins are measured and cached in BASELINE_MEASURED.json:
- torch_cpu (PRIMARY, the vs_baseline denominator): the reference's
  execution model re-implemented in torch eager CPU
  (bench_torch_baseline.py) — an independent runtime with its own C++
  kernels, architecture twins of the same nets;
- xla_cpu: this framework itself on ONE CPU device in reference-style
  per-line mode (continuity with round-1 numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_FILE = REPO / "BASELINE_MEASURED.json"

N_PAGES = 12
PAGE_H, PAGE_W = 1600, 2640
N_LINES = 8


def make_volume(n_pages: int) -> list[np.ndarray]:
    """Realistic synthetic pecha volume (VERDICT r1 weak #4): line counts
    vary per page (N_LINES±2), each line has its own height, indent,
    vertical jitter and intra-line ink gaps, the whole page carries a small
    shear (≈±0.5° skew) and salt-pepper specks — so deskew, contour
    filtering, adaptive-k extraction and the recognizer's width buckets see
    the variability real pechas produce, not 8 identical bands."""
    rng = np.random.default_rng(42)
    pages = []
    for _ in range(n_pages):
        img = np.full((PAGE_H, PAGE_W, 3), 235, np.uint8)
        noise = rng.integers(-12, 12, size=img.shape)
        img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
        n_lines = max(1, N_LINES + int(rng.integers(-2, 3)))
        shear = float(rng.uniform(-0.009, 0.009))
        step = PAGE_H // (n_lines + 1)
        for i in range(n_lines):
            h = int(rng.integers(28, min(45, step - 12)))
            x0 = int(rng.integers(80, 240))
            x1 = PAGE_W - int(rng.integers(80, 240))
            y_line = step * (i + 1) + int(rng.integers(-6, 7))
            x = x0
            while x < x1:
                w = min(int(rng.integers(120, 400)), x1 - x)
                y0 = y_line + int(shear * x)
                img[y0 : y0 + h, x : x + w] = rng.integers(
                    20, 70, size=(h, w, 3)
                )
                # short ink gap: < 23 px keeps the 41-wide density window
                # above threshold, so the band stays one detected line
                x += w + int(rng.integers(6, 16))
        for _ in range(int(rng.integers(40, 120))):
            sy = int(rng.integers(0, PAGE_H - 3))
            sx = int(rng.integers(0, PAGE_W - 3))
            img[sy : sy + 3, sx : sx + 3] = int(rng.integers(10, 60))
        pages.append(img)
    return pages


def build(det_chunk: int | None = None, per_line: bool = False, mesh=None):
    """det_chunk=16 splits a 24-tile page into two forward programs —
    over the axon relay that pipelines dispatch/transfer against execution
    (measured median 7.2 pages/s vs 6.4 at one 24-tile program and 3.5
    fully fused; see docs/PERFORMANCE.md)."""
    if det_chunk is None:
        det_chunk = int(os.environ.get("BENCH_DET_CHUNK", "16"))
    import jax.numpy as jnp
    from flax import linen as nn
    import jax

    from ocr_inference_tpu.core.data import (
        BatchConfig,
        CharsetEncoder,
        OCRModelConfig,
    )
    from ocr_inference_tpu.models import Easter2, UNet
    from ocr_inference_tpu.models.params import init_recognizer, init_segmentation
    from ocr_inference_tpu.pipeline import (
        OCRPipeline,
        RecognitionEngine,
        SegmentationEngine,
    )

    class BenchLineModel(nn.Module):
        """Full UNet compute (cost realism) + a deterministic dark-band
        detector (functional masks despite random weights). bf16 +
        space-to-depth stem like the production builder default
        (pipeline/builder.py; the stem2 variant became the flagship after
        EVAL_r03 put it at CER 0.70% vs stride-1's 0.89%)."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            unet_logits = UNet(classes=1, stem_stride=2,
                               dtype=jnp.bfloat16)(x, train)
            dark = 1.0 - jnp.mean(x, axis=-1, keepdims=True)
            # separable box filter == the 9x41 window (zero-pad SAME keeps
            # the identity); the fused 369-tap reduce_window costs ~70ms of
            # device time per 24-tile page, the two passes are ~free
            density = nn.avg_pool(dark, (9, 1), strides=(1, 1), padding="SAME")
            density = nn.avg_pool(density, (1, 41), strides=(1, 1), padding="SAME")
            return unet_logits * 1e-6 + (density - 0.35) * 40.0

    det_model = BenchLineModel()
    det_vars = init_segmentation(det_model)
    # open_width_frac matches the production stem2 flagship (builder.py);
    # two fused 1-D reduce_windows, so the cost realism is exact
    det = SegmentationEngine(det_model, det_vars, mode="line",
                             tile_chunk=det_chunk, mesh=mesh,
                             open_width_frac=0.02)

    charset = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'" )
    cfg = OCRModelConfig(
        model_file="", architecture="Easter2", input_width=3000,
        input_height=80, input_layer="input", output_layer="output",
        squeeze_channel=True, swap_hw=False, encoder=CharsetEncoder.WYLIE,
        charset=charset, add_blank=True, version="bench",
    )
    rec_model = Easter2(vocab_size=len(charset) + 1, dtype=jnp.bfloat16)
    rec_vars = init_recognizer(rec_model, 80, 256)
    batch_cfg = BatchConfig(
        max_lines_per_batch=1 if per_line else 64,
        width_buckets=(3000,) if per_line else (512, 1024, 2000, 2500, 3000),
    )
    rec = RecognitionEngine(
        rec_model, rec_vars, cfg, batch_cfg=batch_cfg, mesh=mesh,
        pack_input=os.environ.get("BENCH_REC_PACK", "1") == "1",
    )
    return OCRPipeline(rec, det)


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return 0.0


def _jit_cache_sizes(pipeline) -> dict:
    """Live compiled-program counts in the engines' shape LRUs — the growth
    metric a 500-page soak must keep flat (BASELINE config 4 spec)."""
    det, rec = pipeline.line_inference, pipeline.ocr_inference
    return {
        "det_pre": len(det._pre_cache._d),
        "det_post": len(det._post_cache._d),
        "rec_fwd": len(rec._fwd_cache._d),
    }


def _percentile(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    i = min(int(q * (len(sorted_vals) - 1) + 0.5), len(sorted_vals) - 1)
    return sorted_vals[i]


def _export_page(rec, exporters) -> bool:
    """Per-page PageXML + text export inside the timed loop — the BASELINE
    config-4 spec exports with the reference's per-page granularity
    (reference: BDRC/pipeline.py:168-171). Clears the page's full-page mask
    afterwards: retaining ~4.2 MB of mask per record was the bulk of the r3
    soak's RSS growth (+1.9 GB over 96 pages x 2 runs).

    Returns False on an export failure instead of raising: one malformed
    page or disk error must be recorded and skipped, not abort a 500-page
    soak partway (round-4 advisory, ADVICE.md)."""
    page_exp, text_exp = exporters
    try:
        if rec.mask is not None and rec.ocr_lines:
            page_exp.export_lines(
                rec.mask, rec.name, rec.lines, rec.ocr_lines,
                angle=rec.angle,
            )
            text_exp.export_lines(None, rec.name, rec.lines, rec.ocr_lines)
    except Exception as e:
        print(f"bench: export failed for {rec.name}: {e}",
              file=sys.stderr, flush=True)
        return False
    finally:
        rec.mask = None
    return True


def run_volume(pipeline, pages, per_line: bool = False, use_tps: bool = False,
               geometry_workers=None, window_pages: int = 8,
               timed_runs: int = 2, total_pages: int | None = None,
               export_dir: str | None = None):
    """Returns (pages/sec, lines/sec, stage_ms, telemetry) over the volume
    (excluding warmup). pages/sec is the MEDIAN of per-window throughputs
    pooled across ``timed_runs`` passes (VERDICT r2 weak #5: best-of-2 rode
    the tunnel's optimistic phase; the median of many windows is the
    steady-state number, with p10/p90 disclosing the spread). stage_ms
    attributes the per-page wall time to detect / geometry / recognize
    (recognition overlaps the next window's detection, so the stage sums may
    exceed the wall clock). telemetry carries the timing distribution,
    recognizer batch-occupancy histogram, RSS and jit-cache growth.

    The TPU path goes through VolumeRunner (cross-page line batching,
    bounded prefetch, detect/recognize overlap); the reference-style
    baseline keeps the sequential page-at-a-time loop the reference CLI
    uses. Set OCR_BENCH_PROFILE=<dir> to capture a jax.profiler trace of
    the timed region.

    ``total_pages`` > len(pages) cycles the page pool by reference (soak
    scale without 500 x 12.7 MB of distinct input RAM; disclosed in the
    JSON as distinct_pages). ``export_dir`` adds per-page PageXML + text
    export inside the timed loop (the config-4 spec) and caps RSS by
    dropping each page's mask once exported.
    """
    from ocr_inference_tpu.core.data import OpStatus

    # warmup: one page populates every jit cache
    status, res = pipeline.run_ocr(pages[0], use_tps=use_tps)
    assert status == OpStatus.SUCCESS, res

    profile_dir = os.environ.get("OCR_BENCH_PROFILE")

    if per_line:
        start = time.perf_counter()
        n_lines = 0
        for page in pages:
            status, res = pipeline.run_ocr(page)
            assert status == OpStatus.SUCCESS, res
            n_lines += len(res[2])
        elapsed = time.perf_counter() - start
        return len(pages) / elapsed, n_lines / elapsed, {}, {}

    from ocr_inference_tpu.pipeline import VolumeRunner

    runner = VolumeRunner(pipeline, window_pages=window_pages,
                          geometry_workers=geometry_workers)
    # warm the runner path once over a prefix that covers the (bucket,
    # batch) shapes the windows produce; the timed region must measure
    # steady state, not first-process compiles
    warm = pages[: min(len(pages), 24)]
    runner.run([(f"w{i}", p) for i, p in enumerate(warm)], use_tps=use_tps)
    # ...then the full streaming shape set ({pow2, quantum} x buckets), so
    # the timed soak compiles NOTHING (jit_cache end == start — r4 measured
    # rec_fwd growing 9 -> 15 mid-soak)
    pipeline.ocr_inference.warm_shapes()

    import contextlib

    import jax

    trace = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    rss_start = _rss_mb()
    jit_start = _jit_cache_sizes(pipeline)
    # live jax.Array count isolates the leak family: flat here + rising RSS
    # = host-side (allocator churn / relay client bookkeeping), rising here
    # = device-buffer retention in the pipeline
    live_start = len(jax.live_arrays())
    pipeline.ocr_inference.occupancy.clear()

    total = total_pages or len(pages)
    exporters = None
    if export_dir is not None:
        from ocr_inference_tpu.io.exporter import (
            PageXMLExporter, TextExporter,
        )

        os.makedirs(export_dir, exist_ok=True)
        exporters = (PageXMLExporter(export_dir), TextExporter(export_dir))

    window_tputs: list[float] = []
    rss_curve: list[float] = []
    total_elapsed = 0.0
    export_errors = 0
    results = []
    with trace:
        for _ in range(timed_runs):
            done_ts: list[float] = []

            def page_done(rec):
                nonlocal export_errors
                if exporters is not None:
                    if not _export_page(rec, exporters):
                        export_errors += 1
                else:
                    rec.mask = None
                done_ts.append(time.perf_counter())
                if len(done_ts) % 50 == 0:
                    rss_curve.append(_rss_mb())

            start = time.perf_counter()
            results = runner.run(
                (
                    (f"p{i}", (lambda k=i: pages[k % len(pages)]))
                    for i in range(total)
                ),
                use_tps=use_tps,
                on_page_done=page_done,
            )
            run_elapsed = time.perf_counter() - start
            total_elapsed += run_elapsed
            # Sustained throughput distribution via SLIDING page spans.
            # The pre-streaming formulation (page-index chunks between
            # completion timestamps) breaks under the streaming flusher,
            # whose bursty in-order emission can complete two chunks in
            # one burst and record a ~1000x spike as a "window"; fixed
            # wall intervals instead quantize to 0/1 counts on small
            # volumes. A span WIDER than any emission burst (the flusher
            # holds at most max_held_pages=16) always crosses burst
            # boundaries, so each sample is a real sustained rate; spans
            # step by window_pages to stay O(volume).
            span = max(window_pages, 32)
            if len(done_ts) <= span:
                window_tputs.append(len(done_ts) / run_elapsed)
            else:
                for k in range(span, len(done_ts), window_pages):
                    dt = done_ts[k] - done_ts[k - span]
                    if dt > 0:
                        window_tputs.append(span / dt)
    assert all(r.status == OpStatus.SUCCESS for r in results), [
        r.error for r in results if r.error
    ]
    n_lines = sum(len(r.ocr_lines) for r in results)
    stage_ms: dict[str, float] = {}
    for r in results:
        for k, v in r.timings_ms.items():
            stage_ms[k] = stage_ms.get(k, 0.0) + v
    stage_ms = {k: round(v / len(results), 1) for k, v in stage_ms.items()}

    wt = sorted(window_tputs)
    occupancy = dict(pipeline.ocr_inference.occupancy)
    real_batches = sorted(
        b for (_, b, _), c in occupancy.items() for _ in range(c)
    )
    waste = sorted(
        (padded - real) / padded
        for (_, real, padded), c in occupancy.items()
        for _ in range(c)
    )
    telemetry = {
        "timing": {
            "median": round(_percentile(wt, 0.5), 3),
            "p10": round(_percentile(wt, 0.1), 3),
            "p90": round(_percentile(wt, 0.9), 3),
            "windows": len(wt),
            "window_pages": window_pages,
            "overall": round(timed_runs * total / total_elapsed, 3),
        },
        "occupancy": {
            f"w{w}:{real}/{padded}": c
            for (w, real, padded), c in sorted(occupancy.items())
        },
        "median_batch": _percentile(real_batches, 0.5),
        # fraction of recognizer batch slots running zero-padded lines,
        # median across device calls (r3 weak #7: keep < 0.15)
        "padding_waste_median": round(_percentile(waste, 0.5), 3),
        "rss_mb": {"start": rss_start, "end": _rss_mb()},
        # sampled every 50 completed pages across the timed runs — the soak
        # plateau (or leak) is visible directly, not just start/end
        "rss_curve_mb": [round(v, 1) for v in rss_curve],
        "jit_cache": {"start": jit_start, "end": _jit_cache_sizes(pipeline)},
        "live_arrays": {"start": live_start, "end": len(jax.live_arrays())},
        # relay-phase-adaptive dispatch record (VolumeRunner.__init__)
        "adaptive": runner.adaptive,
    }
    if exporters is not None:
        import glob as _glob

        telemetry["exports"] = {
            "xml": len(_glob.glob(os.path.join(export_dir, "*.xml"))),
            "txt": len(_glob.glob(os.path.join(export_dir, "*.txt"))),
            "errors": export_errors,
        }
    pps = telemetry["timing"]["median"]
    return pps, pps * n_lines / total, stage_ms, telemetry


def make_curved_volume(n_pages: int) -> list[np.ndarray]:
    """Pages with sine-curved text bands so the TPS gate trips (curved if a
    line's center-y spread across 5 probe slices exceeds the slice height,
    dewarp/tps.py check_line_tps). BASELINE config 2 workload."""
    rng = np.random.default_rng(7)
    pages = []
    xs = np.arange(PAGE_W - 200)
    for _ in range(n_pages):
        img = np.full((PAGE_H, PAGE_W, 3), 235, np.uint8)
        noise = rng.integers(-12, 12, size=img.shape)
        img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
        step = PAGE_H // (N_LINES + 1)
        wave = (40 * np.sin(xs / (PAGE_W / 6.0))).astype(int)
        for i in range(N_LINES):
            y0 = step * (i + 1)
            for dx, dy in zip(xs, wave):
                img[y0 + dy : y0 + dy + 36, 100 + dx] = 45
        pages.append(img)
    return pages


def run_single_stream(pipeline, pages) -> tuple[float, float]:
    """BASELINE config 1: the reference CLI's one-page-at-a-time loop
    (cli.py:113-139) on the TPU pipeline. Returns (pages/s, lines/s)."""
    from ocr_inference_tpu.core.data import OpStatus

    status, res = pipeline.run_ocr(pages[0])  # warm
    assert status == OpStatus.SUCCESS, res
    best = 0.0
    n_lines = 0
    for _ in range(2):
        start = time.perf_counter()
        n_lines = 0
        for page in pages:
            status, res = pipeline.run_ocr(page)
            assert status == OpStatus.SUCCESS, res
            n_lines += len(res[2])
        elapsed = time.perf_counter() - start
        best = max(best, len(pages) / elapsed)
    return best, best * n_lines / len(pages)


def run_serve_bench(n_requests: int, rate_rps: float | None = None) -> dict:
    """BASELINE config-1-serve (VERDICT r2 item 7): bocr-serve's dynamic
    batching against an open-loop Poisson request stream, reported as
    throughput + latency percentiles vs config 1's sequential page loop
    (the reference CLI shape, cli.py:113-139).

    Drives the REAL serve loop (cli/serve_cli.serve_loop + _LineReader's
    select()-based drain) over an os.pipe: a feeder thread writes one JSONL
    request per page at exponential inter-arrival times; each page's latency
    runs from its request's write timestamp to its on_page_done emit. The
    pipeline/model/pages are identical to config 1, so serve_pages_per_sec
    is directly comparable to pages_per_sec_single_stream."""
    import tempfile
    import threading

    import cv2

    from ocr_inference_tpu.cli.serve_cli import _LineReader, serve_loop
    from ocr_inference_tpu.core.data import Encoding, OpStatus
    from ocr_inference_tpu.pipeline import VolumeRunner

    if rate_rps is None:
        rate_rps = float(os.environ.get("BENCH_SERVE_RPS", "6.0"))
    pipeline = build()
    runner = VolumeRunner(pipeline, window_pages=4)
    pages = make_volume(min(n_requests, N_PAGES))

    with tempfile.TemporaryDirectory() as workdir:
        paths = []
        for i in range(n_requests):
            p = os.path.join(workdir, f"req_{i:04d}.png")
            if i < len(pages):
                cv2.imwrite(p, pages[i])
            else:
                os.symlink(os.path.join(workdir, f"req_{i % len(pages):04d}.png"), p)
            paths.append(p)

        def load(path):
            def _load():
                img = cv2.imread(path)
                return None if img is None else cv2.cvtColor(
                    img, cv2.COLOR_BGR2RGB
                )

            return _load

        # warm every jit shape the serve bursts will hit (window 4 plus
        # partial tails) — the timed stream must measure steady state
        warm = runner.run([(f"warm{i}", load(p)()) for i, p in
                           enumerate(paths[: min(8, len(paths))])])
        assert all(r.status == OpStatus.SUCCESS for r in warm)

        arrival: dict[str, float] = {}
        done: dict[str, float] = {}
        shed: dict[str, float] = {}
        bursts: list[int] = []

        rng = np.random.default_rng(123)
        gaps = rng.exponential(1.0 / rate_rps, size=n_requests)
        r_fd, w_fd = os.pipe()

        def feeder():
            try:
                for path, gap in zip(paths, gaps):
                    time.sleep(gap)
                    line = (json.dumps({"image": path}) + "\n").encode()
                    arrival[path] = time.perf_counter()
                    os.write(w_fd, line)
            finally:
                os.close(w_fd)

        def emit(rec):
            done[rec.name] = time.perf_counter()

        def emit_error(obj):
            # overload shedding is a VALID protocol response (429-style,
            # serve_cli.serve_loop max_queue) — recorded, not fatal
            if obj.get("status") == "shed":
                shed[obj["image"]] = time.perf_counter()
                return
            raise AssertionError(f"serve error response: {obj}")

        real_run = runner.run

        def counted_run(images, **kw):
            images = list(images)
            bursts.append(len(images))
            return real_run(images, **kw)

        runner.run = counted_run
        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        max_queue = int(os.environ.get("BENCH_SERVE_MAXQ", "32"))
        serve_loop(runner, _LineReader(fd=r_fd), load, emit, emit_error,
                   encoding=Encoding.UNICODE,
                   max_queue=max_queue if max_queue > 0 else None)
        t.join()
        os.close(r_fd)

    assert len(done) + len(shed) == n_requests, (
        len(done), len(shed), n_requests
    )
    # latency percentiles cover ACCEPTED requests; sheds answer in ~0 time
    # by design and are reported via shed_rate (VERDICT r4 item 6: the
    # overload criterion is p90 of accepted <= 2x p50, sheds disclosed)
    lats = sorted(done[p] - arrival[p] for p in paths if p in done)
    span = max(done.values()) - min(arrival.values())
    return {
        "serve_pages_per_sec": round(len(done) / span, 3),
        "request_rate_rps": rate_rps,
        "requests": n_requests,
        "accepted": len(done),
        "shed": len(shed),
        "shed_rate": round(len(shed) / n_requests, 3),
        "max_queue": max_queue,
        "latency_s": {
            "p50": round(_percentile(lats, 0.5), 3),
            "p90": round(_percentile(lats, 0.9), 3),
            "p99": round(_percentile(lats, 0.99), 3),
        },
        "bursts": len(bursts),
        "mean_burst_pages": round(sum(bursts) / max(len(bursts), 1), 2),
        "window_pages": 4,
    }


def run_modern_layout(n_pages: int, workdir: str) -> float:
    """BASELINE config 3: ModernBookFormat layout detection over a page dir
    (reference: inference.py:921-961). Returns pages/s."""
    import cv2

    from ocr_inference_tpu.core.data import LayoutDetectionConfig
    from ocr_inference_tpu.pipeline.modern_layout import (
        ModernBookFormatLayoutDetection,
    )

    rng = np.random.default_rng(11)
    pages_dir = os.path.join(workdir, "pages")
    out_dir = os.path.join(workdir, "layout_out")
    os.makedirs(pages_dir, exist_ok=True)
    for i in range(n_pages):
        img = np.full((PAGE_H, PAGE_W, 3), 240, np.uint8)
        img[60:140, 200:-200] = 70  # header band
        img[-140:-60, 200:-200] = 70  # footer band
        img += rng.integers(-8, 8, img.shape).astype(np.uint8)
        cv2.imwrite(os.path.join(pages_dir, f"p{i:03d}.png"), img)

    config = LayoutDetectionConfig(
        checkpoint="", onnx_file="", architecture="deeplabv3plus",
        patch_size=512,
        classes=["background", "header", "footer", "text"],
    )
    det = ModernBookFormatLayoutDetection(config, allow_random=True)
    det.run(pages_dir, out_dir, filter_classes=["header", "footer"])  # warm
    best = 0.0
    for _ in range(2):
        start = time.perf_counter()
        det.run(pages_dir, out_dir, filter_classes=["header", "footer"])
        best = max(best, n_pages / (time.perf_counter() - start))
    return best


_PEAK_BF16_TFLOPS = [
    # (device_kind substring, published peak dense bf16 TFLOPs per chip)
    ("v6", 918.0), ("v5p", 459.0), ("v5e", 197.0), ("v5 lite", 197.0),
    ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
]


def _peak_flops(device) -> tuple[float, bool]:
    """(peak bf16 FLOP/s, assumed?) for the chip running the bench."""
    kind = getattr(device, "device_kind", "").lower()
    for sub, tf in _PEAK_BF16_TFLOPS:
        if sub in kind:
            return tf * 1e12, False
    return 197.0e12, True  # conservative v5e-class assumption


def _compiled_flops(compiled) -> float:
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def measure_mfu(det_model, det_vars, rec_model, rec_vars,
                iters: int = 10, rec_batch: int = 8) -> dict:
    """Per-stage MFU of the two jitted model forwards (VERDICT r1 item 5).

    MFU = XLA-reported model FLOPs / measured steady-state device time /
    chip peak bf16 FLOP/s, on the shapes the volume pipeline actually runs
    (one page = 24-32 detection tiles; ``rec_batch`` = the MEDIAN real line
    batch the volume run measured via the occupancy histogram, so the
    recognizer MFU is quoted at the batch the pipeline actually runs —
    VERDICT r2 weak #3)."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    peak, assumed = _peak_flops(dev)
    out = {
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "peak_tflops_bf16": round(peak / 1e12, 1),
        "peak_assumed": assumed,
    }
    rng = np.random.default_rng(0)
    stages = {
        "detect_unet": (
            lambda v, x: det_model.apply(v, x, train=False),
            det_vars,
            jnp.asarray(
                rng.random((32, 512, 512, 3), dtype=np.float32)
            ),
        ),
        "recognize_easter2": (
            lambda v, x: rec_model.apply(v, x, train=False),
            rec_vars,
            jnp.asarray(
                rng.random((max(rec_batch, 1), 80, 3000), dtype=np.float32)
                * 2 - 1
            ),
        ),
    }
    def sync(r):
        # block_until_ready does NOT wait for remote execution over the
        # axon tunnel (CLAUDE.md) — a value readback is the only real sync
        float(jnp.sum(jnp.abs(r).astype(jnp.float32)))

    for name, (fn, variables, x) in stages.items():
        jf = jax.jit(fn)
        compiled = jf.lower(variables, x).compile()
        flops = _compiled_flops(compiled)
        sync(compiled(variables, x))  # warm
        start = time.perf_counter()
        for _ in range(iters):
            r = compiled(variables, x)
        sync(r)
        dt = (time.perf_counter() - start) / iters
        out[name] = {
            "batch": list(x.shape),
            "gflops": round(flops / 1e9, 2),
            "ms": round(dt * 1e3, 2),
            "mfu": round(flops / dt / peak, 4),
        }
    return out


def pallas_parity_check() -> dict:
    """One compiled-Pallas-vs-XLA comparison on the real chip (VERDICT r1
    item 6): the fused tile binarize and the line-canvas binarize against
    their XLA twins, max abs diff recorded in the bench JSON (0 = bit
    equal)."""
    import jax
    import jax.numpy as jnp

    from ocr_inference_tpu.ops import imaging, pallas_kernels

    rng = np.random.default_rng(3)
    tiles = jnp.asarray(
        rng.integers(0, 256, (4, 512, 512, 3), dtype=np.uint8)
    )
    want_t = np.asarray(jax.vmap(imaging.binarize)(tiles)[..., 0])
    got_t = np.asarray(pallas_kernels.binarize_tiles_pallas(tiles))
    tile_diff = int(np.abs(want_t.astype(int) - got_t.astype(int)).max())

    gray = jnp.asarray(rng.integers(0, 256, (4, 80, 2000), dtype=np.uint8))
    want_l = np.asarray(
        jax.vmap(imaging.adaptive_threshold_gaussian)(gray)
    )
    got_l = np.asarray(pallas_kernels.binarize_lines_pallas(gray))
    line_diff = int(np.abs(want_l.astype(int) - got_l.astype(int)).max())
    return {
        "tile_binarize_max_abs_diff": tile_diff,
        "line_binarize_max_abs_diff": line_diff,
    }


def measure_baseline() -> dict:
    """Reference-style CPU run: one CPU device, per-line recognition."""
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        pipeline = build(det_chunk=8, per_line=True)
        pages = make_volume(3)
        pps, lps, _, _ = run_volume(pipeline, pages, per_line=True)
    return {
        "pages_per_sec": pps,
        "lines_per_sec": lps,
        "mode": "cpu-1dev-per-line (reference-style)",
        "pages": 3,
    }


def measure_baseline_torch() -> dict:
    """Reference-style CPU run in an INDEPENDENT runtime: torch eager CPU
    (bench_torch_baseline.py) — per-line recognition, whole-tile-batch
    detection, cv2 geometry. The closest available stand-in for the
    reference's CPU ONNXRuntime sessions."""
    from bench_torch_baseline import measure

    charset = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ'")
    return measure(make_volume(3), charset)


def load_baselines() -> dict:
    """Read (or measure and cache) both CPU baselines. Migrates the legacy
    single-baseline file format in place."""
    baselines: dict = {}
    changed = False
    if BASELINE_FILE.is_file():
        data = json.loads(BASELINE_FILE.read_text())
        if "pages_per_sec" in data:  # legacy: the XLA stand-in alone
            baselines["xla_cpu"] = data
            changed = True
        else:
            baselines = data
    if "xla_cpu" not in baselines:
        baselines["xla_cpu"] = measure_baseline()
        changed = True
    if "torch_cpu" not in baselines:
        baselines["torch_cpu"] = measure_baseline_torch()
        changed = True
    if changed:
        BASELINE_FILE.write_text(json.dumps(baselines, indent=2))
    return baselines


def main(argv=None):
    """Default (no args) = BASELINE config 4 (batched volume), the number
    the driver records. --config 1/2/3/5 run the other BASELINE.md
    configurations: single-stream CLI-style, dewarped volume, modern
    layout, and the data-parallel mesh sweep."""
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=4,
                        choices=[1, 2, 3, 4, 5, 6])
    parser.add_argument("--pages", type=int, default=None,
                        help="volume size (default: 500 for configs 4/5 — "
                             "the BASELINE config 4 ~500-page volume spec, "
                             "with per-page PageXML/text export in the "
                             "timed loop — else 12)")
    args = parser.parse_args(argv)
    if args.pages is None:
        args.pages = (500 if args.config in (4, 5)
                      else 48 if args.config == 6 else N_PAGES)

    from ocr_inference_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # Backend-init watchdog: a wedged axon relay hangs the first PJRT touch
    # FOREVER (observed: relay process alive + listening but upstream
    # stdio pump dead — zero bytes flow, client blocks in PJRT init with
    # no timeout). Exiting non-zero lets the caller's retry loop take a
    # second attempt / surface the infra failure instead of stalling.
    # Scope: EVERY first PJRT touch (device enumeration for both backends)
    # happens inside this guard, and nothing else: the torch-cpu baseline
    # loop (~30+ min, never touches PJRT) and the xla_cpu baseline
    # measurement (minutes of legitimate CPU compute on an
    # already-initialized backend) run AFTER init_done — the round-4
    # advisory found measure_baseline()'s jax.local_devices() could become
    # the first, unguarded PJRT touch when the baseline cache was missing.
    # probe_pallas runs out of process with its own 900s bound (a hung
    # Mosaic compile degrades to Pallas-off, it must not hard-kill the
    # bench).
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(float(os.environ.get("BENCH_INIT_TIMEOUT", "600"))):
            print(
                "bench: jax backend init did not complete within "
                "BENCH_INIT_TIMEOUT (default 600s) — axon relay wedged? "
                "(healthy init takes seconds; compiles happen later)",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    n_dev = len(jax.devices())
    jax.local_devices(backend="cpu")  # CPU-backend init, same guard
    init_done.set()

    baselines = load_baselines()
    baseline = baselines["torch_cpu"]

    # enable the fused Pallas image kernels when the chip compiles them
    # (one bounded out-of-process probe; persists via marker + XLA cache)
    from ocr_inference_tpu.ops.pallas_kernels import pallas_enabled, probe_pallas

    probe_pallas(timeout_s=900)
    result = {
        "unit": "pages/s",
        "baseline_pages_per_sec": round(baseline["pages_per_sec"], 4),
        # disclosed in-JSON (VERDICT r1 weak #3): ONNXRuntime is not
        # installable here, so the primary baseline is the reference's
        # execution model in torch eager CPU (bench_torch_baseline.py) — an
        # independent runtime with its own C++ kernels, the closest stand-in
        # for CPU ONNXRuntime. The XLA-CPU stand-in (this framework itself,
        # per-line on one CPU device) is reported alongside for continuity.
        "baseline_mode": baseline.get("mode", "unknown"),
        "xla_cpu_baseline_pages_per_sec": round(
            baselines["xla_cpu"]["pages_per_sec"], 4
        ),
        "pages": args.pages,
        "page_shape": [PAGE_H, PAGE_W],
        "devices": n_dev,
        "pallas": pallas_enabled(),
        "timed_runs": 2,
        "config": args.config,
    }

    if args.config == 1:
        pipeline = build()
        pps, lps = run_single_stream(pipeline, make_volume(args.pages))
        result.update(metric="pages_per_sec_single_stream",
                      lines_per_sec=round(lps, 1))
    elif args.config == 2:
        pipeline = build()
        # 2 geometry workers even on a 1-core host: the TPS warp + packed
        # D2H leave the geometry thread sleeping on device work, so a second
        # worker's curvature/second-pass CPU overlaps it (VERDICT r2 item 8)
        pps, lps, stage_ms, telemetry = run_volume(
            pipeline, make_curved_volume(args.pages), use_tps=True,
            geometry_workers=2,
        )
        result.update(metric="pages_per_sec_dewarped",
                      lines_per_sec=round(lps, 1),
                      stage_ms_per_page=stage_ms, tps=True,
                      timing=telemetry.get("timing"))
    elif args.config == 6:
        serve = run_serve_bench(args.pages)
        result.update(metric="pages_per_sec_serve", **serve)
        pps = serve["serve_pages_per_sec"]
    elif args.config == 3:
        import tempfile

        with tempfile.TemporaryDirectory() as workdir:
            pps = run_modern_layout(args.pages, workdir)
        result.update(metric="pages_per_sec_modern_layout")
    else:
        # config 4 (volume) / 5 (data-parallel mesh sweep). Config 5 builds
        # the mesh unconditionally; config 4 only when several devices
        # exist (a 1-device mesh still exercises the sharded code path).
        mesh = None
        if args.config == 5 or n_dev > 1:
            from ocr_inference_tpu.parallel import make_mesh

            mesh = make_mesh()
        pipeline = build(mesh=mesh)
        # one timed pass at soak scale (>= 200 pages gives 25+ windows for
        # the median on its own); two passes below that, as before
        timed_runs = 1 if args.pages >= 200 else 2
        result["timed_runs"] = timed_runs
        pool = make_volume(min(args.pages, 96))
        import tempfile

        with tempfile.TemporaryDirectory() as exp_dir:
            pps, lps, stage_ms, telemetry = run_volume(
                pipeline, pool, total_pages=args.pages,
                export_dir=exp_dir, timed_runs=timed_runs,
            )
        det_eng, rec_eng = pipeline.line_inference, pipeline.ocr_inference
        result.update(
            metric="pages_per_sec_end_to_end",
            lines_per_sec=round(lps, 1),
            distinct_pages=len(pool),
            mesh=dict(mesh.shape) if mesh is not None else None,
            stage_ms_per_page=stage_ms,
            **telemetry,
            mfu=measure_mfu(
                det_eng.model, det_eng.variables,
                rec_eng.model, rec_eng.variables,
                rec_batch=int(telemetry.get("median_batch", 8)),
            ),
        )
        if pallas_enabled():
            result["pallas_parity"] = pallas_parity_check()

    result["value"] = round(pps, 3)
    # vs_baseline divides by the STRONGER of the two reference stand-ins
    # (r3 verdict weak #6: the torch-cpu number came from 3 pages on a
    # 1-vCPU host and inflates the ratio; the defensible claim is the
    # conservative one). Both denominators stay disclosed above.
    strongest = max(
        baseline["pages_per_sec"], baselines["xla_cpu"]["pages_per_sec"]
    )
    result["vs_baseline"] = round(pps / strongest, 2)
    result["vs_baseline_torch_cpu"] = round(
        pps / baseline["pages_per_sec"], 2
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
