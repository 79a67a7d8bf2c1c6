"""VolumeRunner tests: cross-page batching, ordering, page isolation."""

import numpy as np

from ocr_inference_tpu.core.data import OpStatus
from tests.test_pipeline import DensityLineModel, CHARSET, _page, engines  # noqa: F401

from ocr_inference_tpu.pipeline import VolumeRunner


def test_volume_runner_processes_pages(engines):
    det, rec = engines
    from ocr_inference_tpu.pipeline import OCRPipeline

    pipeline = OCRPipeline(rec, det)
    runner = VolumeRunner(pipeline, window_pages=3)

    pages = [(f"p{i}", _page(n_lines=3 + (i % 2))) for i in range(5)]
    done = []
    results = runner.run(pages, on_page_done=lambda r: done.append(r.name))

    assert len(results) == 5
    assert [r.name for r in results] == [f"p{i}" for i in range(5)]
    assert done == [r.name for r in results]
    for i, rec_ in enumerate(results):
        assert rec_.status == OpStatus.SUCCESS, rec_.error
        expected = 3 + (i % 2)
        assert len(rec_.lines) == expected
        assert len(rec_.ocr_lines) == expected
        ys = [l.center[1] for l in rec_.lines]
        assert ys == sorted(ys)
        assert "detect" in rec_.timings_ms


def test_volume_runner_page_isolation(engines):
    det, rec = engines
    from ocr_inference_tpu.pipeline import OCRPipeline

    pipeline = OCRPipeline(rec, det)
    runner = VolumeRunner(pipeline, window_pages=2)
    blank = np.full((600, 1200, 3), 235, np.uint8)
    pages = [
        ("good1", _page(n_lines=2)),
        ("blank", blank),
        ("bad", None),
        ("good2", _page(n_lines=3)),
    ]
    results = runner.run(pages)
    by_name = {r.name: r for r in results}
    assert by_name["good1"].status == OpStatus.SUCCESS
    assert by_name["good2"].status == OpStatus.SUCCESS
    assert by_name["blank"].status == OpStatus.FAILED
    assert by_name["bad"].status == OpStatus.FAILED
    assert len(by_name["good2"].ocr_lines) == 3


def test_volume_runner_lazy_loaders(engines):
    det, rec = engines
    from ocr_inference_tpu.pipeline import OCRPipeline

    pipeline = OCRPipeline(rec, det)
    runner = VolumeRunner(pipeline, window_pages=4)
    calls = []

    def loader(i):
        def load():
            calls.append(i)
            return _page(n_lines=2)
        return load

    results = runner.run([(f"p{i}", loader(i)) for i in range(3)])
    assert sorted(calls) == [0, 1, 2]
    assert all(r.status == OpStatus.SUCCESS for r in results)


def test_volume_streaming_shapes_and_carry(engines):
    """Streaming recognition (VERDICT r4 item 7): under-full buckets carry
    across windows, every device call runs a shape from the closed
    {pow2 <= quantum, quantum} set, warm_shapes() pre-compiles that whole
    set (zero new jit entries during the run), and results keep input
    order."""
    det, rec = engines
    from ocr_inference_tpu.pipeline import OCRPipeline

    pipeline = OCRPipeline(rec, det)
    runner = VolumeRunner(pipeline, window_pages=2)
    rec.warm_shapes()
    jit_before = len(rec._fwd_cache._d)
    rec.occupancy.clear()

    pages = [(f"p{i}", _page(n_lines=2 + (i % 3))) for i in range(7)]
    results = runner.run(pages)
    assert [r.name for r in results] == [f"p{i}" for i in range(7)]
    for i, r in enumerate(results):
        assert r.status == OpStatus.SUCCESS, r.error
        assert len(r.ocr_lines) == 2 + (i % 3)

    q = rec._stream_quantum(None)
    allowed = set()
    b = 1
    while b <= q:
        allowed.add(b)
        b *= 2
    allowed.add(q)
    padded = {p for (_, _, p) in rec.occupancy}
    assert padded <= allowed, (padded, allowed)
    # the warm set covered every shape the run needed
    assert len(rec._fwd_cache._d) == jit_before


def test_volume_streaming_bounded_holding(engines):
    """max_held_pages=1 forces carried buckets to flush so no page waits
    behind the carry: every record still completes, in order."""
    det, rec = engines
    from ocr_inference_tpu.pipeline import OCRPipeline

    pipeline = OCRPipeline(rec, det)
    runner = VolumeRunner(pipeline, window_pages=1, max_held_pages=1)
    pages = [(f"h{i}", _page(n_lines=2)) for i in range(4)]
    done_order = []
    results = runner.run(pages, on_page_done=lambda r: done_order.append(r.name))
    assert [r.name for r in results] == [f"h{i}" for i in range(4)]
    assert done_order == [r.name for r in results]
    assert all(r.status == OpStatus.SUCCESS for r in results)


def test_volume_runner_stress_mixed_failures(engines):
    """30 pages with interleaved failure modes (None images, raising
    loaders, blanks) keep order, isolation, and overlap plumbing intact
    across several windows and geometry workers."""
    det, rec = engines
    from ocr_inference_tpu.pipeline import OCRPipeline

    pipeline = OCRPipeline(rec, det)
    runner = VolumeRunner(pipeline, window_pages=4, geometry_workers=3)

    def raising_loader():
        raise IOError("corrupt file")

    blank = np.full((600, 1200, 3), 235, np.uint8)
    pages = []
    expected_ok = set()
    for i in range(30):
        name = f"s{i:02d}"
        kind = i % 5
        if kind == 0:
            pages.append((name, None))
        elif kind == 1:
            pages.append((name, raising_loader))
        elif kind == 2:
            pages.append((name, blank))
        else:
            n = 2 + i % 3
            pages.append((name, _page(n_lines=n)))
            expected_ok.add(name)
    results = runner.run(pages)
    assert [r.name for r in results] == [f"s{i:02d}" for i in range(30)]
    for r in results:
        if r.name in expected_ok:
            assert r.status == OpStatus.SUCCESS, (r.name, r.error)
            assert r.ocr_lines
        else:
            assert r.status == OpStatus.FAILED
