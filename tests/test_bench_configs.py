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
    pps, lps, stage_ms = bench_mod.run_volume(
        pipeline, bench_mod.make_curved_volume(2), use_tps=True
    )
    assert pps > 0
    assert "detect" in stage_ms


def test_config3_modern_layout(bench_mod, tmp_path):
    pps = bench_mod.run_modern_layout(2, str(tmp_path))
    assert pps > 0
    out = list((tmp_path / "layout_out").glob("*.json"))
    assert len(out) == 2
