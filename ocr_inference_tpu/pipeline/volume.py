"""Volume runner: batched multi-page OCR with cross-page line batching.

The reference processes one page at a time and one line per recognizer call
(reference: cli.py:113-139, inference.py:630-635). For volume workloads
(BASELINE configs 4-5) this runner restructures the work TPU-first:

- phase 1 (per page, pipelined): device detection + host geometry produce
  line strips; disk/decode for upcoming pages overlaps device work through a
  BOUNDED prefetch queue (a 500-page volume never materializes more than a
  window's worth of decoded pages in RAM);
- phase 2 (cross-page): ALL strips of the window are recognized together —
  width buckets fill with lines from many pages, so the recognizer runs at
  large batch sizes regardless of per-page line counts. Window recognition
  runs on a background thread, overlapping with the NEXT window's detection
  and host geometry (double buffering);
- phase 3: results scatter back to their pages, convert encoding, export.

Failure isolation is per page (a bad page never kills the volume), and the
returned records carry the same payload as OCRPipeline.run_ocr.
"""

from __future__ import annotations

import os
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

import numpy as np

from ocr_inference_tpu.core.data import Encoding, Line, OCRLine, OpStatus
from ocr_inference_tpu.pipeline.ocr_pipeline import OCRPipeline


@dataclass
class PageRecord:
    name: str
    status: OpStatus
    error: Optional[str] = None
    mask: Optional[np.ndarray] = None
    lines: list[Line] = field(default_factory=list)
    ocr_lines: list[OCRLine] = field(default_factory=list)
    angle: float = 0.0
    timings_ms: dict[str, float] = field(default_factory=dict)


class VolumeRunner:
    """Cross-page batched execution of an OCRPipeline."""

    def __init__(
        self,
        pipeline: OCRPipeline,
        window_pages: int = 8,
        prefetch_workers: Optional[int] = None,
        geometry_workers: Optional[int] = None,
        detect_ahead: Optional[int] = None,
    ):
        # Auto worker counts key on host cores: on a 1-2 core host the
        # extra threads only time-slice the same core (decode, geometry,
        # window flush and the dispatch loop all contend), so overlap
        # degrades into pure switching overhead. (2, 2) stays the default
        # on real multi-core hosts — the sweep in docs/PERFORMANCE.md put
        # it on top there.
        ncpu = os.cpu_count() or 1
        if geometry_workers is None:
            geometry_workers = 2 if ncpu > 2 else 1
        if prefetch_workers is None:
            prefetch_workers = 2 if ncpu > 2 else 1
        self.pipeline = pipeline
        self.window_pages = max(1, window_pages)
        self.prefetch_workers = max(1, prefetch_workers)
        self.geometry_workers = max(1, geometry_workers)
        # How many pages may have detection dispatched (device programs
        # enqueued) beyond the ones whose geometry is resolving. Deeper
        # keeps the device queue full across the per-page D2H sync — over a
        # high-RTT transport the next pages' uploads/forwards execute while
        # the geometry thread blocks on page i's mask readback. Worth HBM:
        # each in-flight page holds its float tile stack (~75 MB at 24
        # tiles). Interleaved A/B on the axon relay (24-page volume,
        # medians of 6 windows): depth 2 -> 6.1, 4 -> 8.3, 8 -> 11.3
        # pages/s (20.6 with packed detection uploads); 16 gained nothing
        # over 8. OCR_DETECT_AHEAD overrides.
        if detect_ahead is None:
            detect_ahead = int(os.environ.get("OCR_DETECT_AHEAD", "8"))
        self.detect_ahead = max(self.geometry_workers + 1, detect_ahead)

    # -- phase 1: one page to strips --

    def _start_detect(self, name: str, image: np.ndarray):
        """Dispatch page detection on device; returns (record, resolver).

        Dispatch errors are absorbed into the record so a bad page still
        never kills the volume."""
        rec = PageRecord(name=name, status=OpStatus.SUCCESS)
        t0 = time.perf_counter()
        try:
            resolver = self.pipeline.detect_lines_async(image)
        except Exception as e:
            rec.status = OpStatus.FAILED
            rec.error = f"page failed: {e}"
            resolver = None
        rec.timings_ms["detect_dispatch"] = (time.perf_counter() - t0) * 1000
        return rec, resolver

    def _page_to_strips(self, rec: PageRecord, image: np.ndarray, resolver, *,
                        use_tps: bool, tps_threshold: float,
                        merge_lines: bool, k_factor: float,
                        bbox_tolerance: float):
        """Resolve a dispatched detection and run the host geometry chain.

        While this host work runs, the NEXT page's detection is already
        executing on device (see run() — the reference interleaves nothing,
        cli.py:113-139)."""
        p = self.pipeline
        if rec.status == OpStatus.FAILED or resolver is None:
            return rec, []
        t0 = time.perf_counter()
        try:
            status, mask = resolver()
            rec.timings_ms["detect"] = (
                (time.perf_counter() - t0) * 1000
                + rec.timings_ms.get("detect_dispatch", 0.0)
            )
            if status == OpStatus.FAILED:
                rec.status, rec.error = status, str(mask)
                return rec, []
            status, result = p.build_lines(image, mask)
            if status == OpStatus.FAILED:
                rec.status, rec.error = status, str(result)
                return rec, []
            rot_img, rot_mask, _, filtered, angle = result
            status, dewarp = p.apply_dewarping(
                rot_img, rot_mask, filtered, angle,
                use_tps=use_tps, tps_threshold=tps_threshold,
            )
            if status == OpStatus.FAILED:
                rec.status, rec.error = status, str(dewarp)
                return rec, []
            status, result = p.extract_lines(
                dewarp.work_img, rot_mask, dewarp.filtered_contours,
                merge_lines=merge_lines, k_factor=k_factor,
                bbox_tolerance=bbox_tolerance,
            )
            if status == OpStatus.FAILED:
                rec.status, rec.error = status, str(result)
                return rec, []
            sorted_lines, strips = result
            # drop degenerate strips with their lines (reference behavior:
            # inference.py:630-632 skips empty strips)
            kept = [
                (s, l)
                for s, l in zip(strips, sorted_lines)
                if s.shape[0] > 0 and s.shape[1] > 0
            ]
            strips = [s for s, _ in kept]
            sorted_lines = [l for _, l in kept]
            rec.mask = rot_mask
            rec.lines = sorted_lines
            rec.angle = float(angle)
            rec.timings_ms["geometry"] = (
                (time.perf_counter() - t0) * 1000
                + rec.timings_ms.get("detect_dispatch", 0.0)
                - rec.timings_ms["detect"]
            )
            return rec, strips
        except Exception as e:  # page isolation
            rec.status = OpStatus.FAILED
            rec.error = f"page failed: {e}"
            return rec, []

    # -- phase 2+3: window recognition (runs on the flush thread) --

    def _flush_window(
        self,
        window: list[tuple[PageRecord, list[np.ndarray]]],
        target_encoding: Encoding,
    ) -> list[PageRecord]:
        p = self.pipeline
        all_strips: list[np.ndarray] = []
        spans: list[tuple[PageRecord, int, int]] = []
        for rec, strips in window:
            start = len(all_strips)
            all_strips.extend(strips)
            spans.append((rec, start, len(all_strips)))
        rec_ms = 0.0
        texts: list[str] = []
        rec_error: Optional[str] = None
        if all_strips:
            t0 = time.perf_counter()
            try:
                texts = p.ocr_inference.run_batch(
                    all_strips, pre_pad=p.use_line_prepadding
                )
            except Exception as e:  # window-level isolation
                rec_error = f"recognition failed: {e}"
            rec_ms = (time.perf_counter() - t0) * 1000

        done: list[PageRecord] = []
        for rec, start, end in spans:
            rec.timings_ms["recognize"] = rec_ms * (
                (end - start) / max(len(all_strips), 1)
            )
            if rec.status == OpStatus.FAILED:
                done.append(rec)
                continue
            if rec_error is not None:
                rec.status, rec.error = OpStatus.FAILED, rec_error
                done.append(rec)
                continue
            ocr_lines = []
            for text, info in zip(texts[start:end], rec.lines):
                pred = text.strip().replace("§", " ")
                pred = p._convert_text(pred, target_encoding)
                ocr_lines.append(
                    OCRLine(
                        guid=info.guid,
                        text=pred,
                        encoding=(
                            Encoding.WYLIE.name
                            if target_encoding == Encoding.WYLIE
                            else Encoding.UNICODE.name
                        ),
                        ctc_conf=None,
                        logits=None,
                        lm_scores=None,
                    )
                )
            rec.ocr_lines = ocr_lines
            done.append(rec)
        return done

    # -- main entry --

    def run(
        self,
        images: Iterable[tuple[str, np.ndarray]] | Iterable[tuple[str, Callable[[], np.ndarray]]],
        target_encoding: Encoding = Encoding.UNICODE,
        use_tps: bool = False,
        tps_threshold: float = 0.25,
        merge_lines: bool = True,
        k_factor: float = 2.5,
        bbox_tolerance: float = 4.0,
        on_page_done: Optional[Callable[[PageRecord], Any]] = None,
    ) -> list[PageRecord]:
        """Process the volume; ``images`` yields (name, array) or
        (name, loader_callable) pairs — callables let disk decode overlap
        device work. Results come back in input order; ``on_page_done``
        fires as each window completes."""
        results: list[PageRecord] = []

        def materialize(item):
            name, img = item
            if callable(img):
                try:
                    img = img()
                except Exception as e:  # loader isolation: bad file != dead volume
                    img = e
            return name, img

        def emit(recs: list[PageRecord]):
            results.extend(recs)
            if on_page_done:
                for r in recs:
                    on_page_done(r)

        # one background recognizer keeps window N's device recognition +
        # decode overlapping window N+1's detection and host geometry,
        # without ever holding more than two windows of strips alive
        flush_pool = ThreadPoolExecutor(max_workers=1)
        pending = None

        def start_flush(window):
            nonlocal pending
            if pending is not None:
                emit(pending.result())
            pending = flush_pool.submit(
                self._flush_window, window, target_encoding
            )

        window: list[tuple[PageRecord, list[np.ndarray]]] = []
        load_pool = ThreadPoolExecutor(max_workers=self.prefetch_workers)
        queue: deque = deque()
        depth = max(self.prefetch_workers + 1, 2)  # bounded decode lookahead
        try:
            items = iter(images)

            def loaded():
                for item in items:
                    queue.append(load_pool.submit(materialize, item))
                    if len(queue) >= depth:
                        yield queue.popleft().result()
                while queue:
                    yield queue.popleft().result()

            # Detection for upcoming pages stays in flight on device while
            # host geometry runs on a small thread pool (cv2/native C++
            # release the GIL), results drained in input order. The
            # reference runs every stage back to back (cli.py:113-139).
            geo_pool = ThreadPoolExecutor(max_workers=self.geometry_workers)
            inflight: deque = deque()
            # distinct from the decode lookahead 'depth' above — rebinding
            # that one would silently cap the loader queue by worker count
            geo_depth = self.detect_ahead

            def process(fut):
                nonlocal window
                window.append(fut.result())
                if len(window) >= self.window_pages:
                    start_flush(window)
                    window = []

            def failed_entry(rec):
                def done():
                    return rec, []

                fut = geo_pool.submit(done)
                return fut

            try:
                for name, img in loaded():
                    if img is None or isinstance(img, Exception):
                        detail = f": {img}" if img is not None else ""
                        fut = failed_entry(
                            PageRecord(
                                name=name, status=OpStatus.FAILED,
                                error=f"load failed{detail}",
                            )
                        )
                    else:
                        # dispatch on the main thread: device execution
                        # order (and jit cache warmth) follows input order
                        rec, resolver = self._start_detect(name, img)
                        fut = geo_pool.submit(
                            self._page_to_strips, rec, img, resolver,
                            use_tps=use_tps, tps_threshold=tps_threshold,
                            merge_lines=merge_lines, k_factor=k_factor,
                            bbox_tolerance=bbox_tolerance,
                        )
                    inflight.append(fut)
                    while len(inflight) > geo_depth:
                        process(inflight.popleft())
                while inflight:
                    process(inflight.popleft())
            finally:
                geo_pool.shutdown(wait=False)
            if window:
                start_flush(window)
            if pending is not None:
                emit(pending.result())
        finally:
            flush_pool.shutdown(wait=False)
            load_pool.shutdown(wait=False)
        return results
