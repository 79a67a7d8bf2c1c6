"""Smoke the bench harness's BASELINE configurations on the CPU mesh.

Shrinks the synthetic page geometry (2-tile pages) so CPU UNet forwards
stay fast, and shares one built pipeline across configs 1-2; the
real-chip numbers come from the driver running bench.py unmodified.
"""

import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench_mod():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    old = (bench.N_PAGES, bench.PAGE_H, bench.PAGE_W, bench.N_LINES)
    bench.N_PAGES, bench.PAGE_H, bench.PAGE_W, bench.N_LINES = 2, 512, 1024, 2
    yield bench
    bench.N_PAGES, bench.PAGE_H, bench.PAGE_W, bench.N_LINES = old


@pytest.fixture(scope="module")
def pipeline(bench_mod):
    return bench_mod.build(det_chunk=8)


def test_make_volumes(bench_mod):
    flat = bench_mod.make_volume(1)[0]
    curved = bench_mod.make_curved_volume(1)[0]
    assert flat.shape == curved.shape == (512, 1024, 3)
    assert not (flat == curved).all()


def test_config1_single_stream(bench_mod, pipeline):
    pps, lps = bench_mod.run_single_stream(pipeline, bench_mod.make_volume(2))
    assert pps > 0 and lps > 0


def test_config2_dewarped_volume(bench_mod, pipeline):
    pps, lps, stage_ms, telemetry = bench_mod.run_volume(
        pipeline, bench_mod.make_curved_volume(2), use_tps=True
    )
    assert pps > 0
    assert "detect" in stage_ms
    t = telemetry["timing"]
    assert t["median"] == pps and t["p10"] <= t["median"] <= t["p90"]
    assert telemetry["rss_mb"]["end"] >= telemetry["rss_mb"]["start"] * 0.5
    assert telemetry["jit_cache"]["end"]["rec_fwd"] >= 1
    # the occupancy histogram records every real recognizer forward
    assert sum(telemetry["occupancy"].values()) >= 1
    assert telemetry["median_batch"] >= 1


def test_config6_serve_bench(bench_mod, monkeypatch):
    monkeypatch.setattr(bench_mod, "N_PAGES", 2)
    out = bench_mod.run_serve_bench(4, rate_rps=50.0)
    assert out["serve_pages_per_sec"] > 0
    assert out["requests"] == 4
    assert 0 < out["latency_s"]["p50"] <= out["latency_s"]["p99"]
    assert 1 <= out["bursts"] <= 4
    assert out["mean_burst_pages"] >= 1


def test_config3_modern_layout(bench_mod, tmp_path):
    pps = bench_mod.run_modern_layout(2, str(tmp_path))
    assert pps > 0
    out = list((tmp_path / "layout_out").glob("*.json"))
    assert len(out) == 2
