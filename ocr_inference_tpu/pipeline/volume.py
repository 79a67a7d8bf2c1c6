"""Volume runner: batched multi-page OCR with cross-page line batching.

The reference processes one page at a time and one line per recognizer call
(reference: cli.py:113-139, inference.py:630-635). For volume workloads
(BASELINE configs 4-5) this runner restructures the work TPU-first:

- phase 1 (per page, pipelined): device detection + host geometry produce
  line strips; disk/decode for upcoming pages overlaps device work through a
  BOUNDED prefetch queue (a 500-page volume never materializes more than a
  window's worth of decoded pages in RAM);
- phase 2 (cross-page, STREAMING): the window's strips join the
  recognizer's width-bucket carry; buckets run on device whenever they can
  fill a full ``stream_quantum`` batch, and under-full buckets (the wide
  w2500/w3000 lines that arrive ~1 per window) carry ACROSS windows instead
  of running batch-1 — BENCH_r04 measured 53 batch-1 wide-bucket calls and
  6 new jit shapes compiling inside the timed soak; the streaming carry
  plus the closed {pow2, quantum} shape set (RecognitionEngine.stream_run /
  warm_shapes) eliminates both. Window recognition runs on a background
  thread, overlapping with the NEXT window's detection and host geometry
  (double buffering); held pages are bounded (``max_held_pages``) by
  force-flushing the buckets that block the oldest page;
- phase 3: results scatter back to their pages, convert encoding, export —
  in input order (a page emits once ALL its lines resolved and every
  earlier page has emitted).

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


class _PendingPage:
    """One page awaiting line texts from the streaming recognizer."""

    __slots__ = ("rec", "slots", "texts", "remaining", "rec_ms")

    def __init__(self, rec: "PageRecord", tokens: list):
        self.rec = rec
        self.slots = {t: i for i, t in enumerate(tokens)}
        self.texts: list = [None] * len(tokens)
        self.remaining = len(tokens)
        self.rec_ms = 0.0


class _StreamFlusher:
    """Flush-thread state: feeds window strips into the recognizer's
    streaming carry (engines.StreamState), bounds the number of pages held
    waiting on under-full buckets, and finalizes completed pages in input
    order. All methods run on VolumeRunner's single flush worker."""

    def __init__(self, pipeline: OCRPipeline, target_encoding: Encoding,
                 quantum: Optional[int], max_held: int):
        self.p = pipeline
        self.engine = pipeline.ocr_inference
        self.state = self.engine.stream_state()
        self.queue: deque = deque()     # _PendingPage, input order
        self.owner: dict = {}           # token -> _PendingPage
        self.quantum = quantum
        self.max_held = max_held
        self.target_encoding = target_encoding
        self._seq = 0

    def add_window(self, window, final: bool = False) -> list:
        """Ingest one window, run what can run, return completed records."""
        for rec, strips in window:
            tokens = list(range(self._seq, self._seq + len(strips)))
            self._seq += len(strips)
            page = _PendingPage(rec, tokens)
            if rec.status == OpStatus.FAILED:
                page.remaining = 0
            else:
                for tok, strip in zip(tokens, strips):
                    self.engine.stream_add(
                        self.state, tok, strip,
                        pre_pad=self.p.use_line_prepadding,
                    )
                    self.owner[tok] = page
            self.queue.append(page)

        # bound held pages: when more than max_held pages wait on carried
        # buckets, force-flush the buckets blocking the oldest ones (their
        # remainders run at pre-warmed pow2 shapes, engines.stream_run)
        force: list = []
        if not final:
            unresolved = [pg for pg in self.queue if pg.remaining]
            excess = len(unresolved) - self.max_held
            if excess > 0:
                for pg in unresolved[:excess]:
                    force.extend(
                        t for t, i in pg.slots.items()
                        if pg.texts[i] is None
                    )

        t0 = time.perf_counter()
        err = None
        try:
            texts = self.engine.stream_run(
                self.state, final=final, force_tokens=force,
                quantum=self.quantum,
            )
        except Exception as e:  # device-level isolation
            texts, err = {}, f"recognition failed: {e}"
        ms = (time.perf_counter() - t0) * 1000
        if err is not None:
            # every page still holding unresolved lines fails together —
            # the same blast radius the pre-streaming window flush had
            self.state = self.engine.stream_state()
            self.owner.clear()
            for pg in self.queue:
                if pg.remaining:
                    pg.rec.status, pg.rec.error = OpStatus.FAILED, err
                    pg.remaining = 0
        elif texts:
            share = ms / len(texts)
            for tok, text in texts.items():
                pg = self.owner.pop(tok)
                pg.texts[pg.slots[tok]] = text
                pg.remaining -= 1
                pg.rec_ms += share

        done = []
        while self.queue and self.queue[0].remaining == 0:
            done.append(self._finalize(self.queue.popleft()))
        return done

    def _finalize(self, page: "_PendingPage") -> "PageRecord":
        rec = page.rec
        rec.timings_ms["recognize"] = page.rec_ms
        if rec.status == OpStatus.FAILED:
            return rec
        ocr_lines = []
        for text, info in zip(page.texts, rec.lines):
            pred = (text or "").strip().replace("§", " ")
            pred = self.p._convert_text(pred, self.target_encoding)
            ocr_lines.append(
                OCRLine(
                    guid=info.guid,
                    text=pred,
                    encoding=(
                        Encoding.WYLIE.name
                        if self.target_encoding == Encoding.WYLIE
                        else Encoding.UNICODE.name
                    ),
                    ctc_conf=None,
                    logits=None,
                    lm_scores=None,
                )
            )
        rec.ocr_lines = ocr_lines
        return rec


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
        stream_quantum: Optional[int] = None,
        max_held_pages: int = 16,
        adaptive: Optional[bool] = None,
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
        # streaming recognition knobs (see _StreamFlusher): quantum None =
        # the engine default (RecognitionEngine.STREAM_QUANTUM); max held
        # pages bounds both emission delay and the RSS of waiting records
        self.stream_quantum = stream_quantum
        self.max_held_pages = max(1, max_held_pages)
        # Relay-phase-adaptive dispatch (VERDICT r4 item 1b): the round-4
        # soak's overall throughput ran 40% below its median because slow
        # transport phases were served with the fast-phase configuration —
        # one process-lifetime H2D probe, fixed detect_ahead. When the
        # rolling emit throughput collapses below 60% of its p75 for two
        # consecutive windows, escalate ONCE (sticky, no thrash): deepen
        # detect_ahead to 16 (keeps the device queue full across longer
        # RTTs) and enable packed detection uploads (fewer bytes always
        # wins when the transport is the bottleneck; the one-time packed
        # pre-program compile persists in the XLA cache).
        if adaptive is None:
            adaptive = os.environ.get("OCR_ADAPTIVE", "1") == "1"
        self.adaptive_enabled = adaptive
        self.adaptive = {"enabled": adaptive, "escalated": False,
                         "events": []}

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

        # adaptive-dispatch monitor: per-emit instantaneous throughput vs
        # its own p75; two consecutive collapses trigger the one-time
        # escalation (see __init__). Runs on the main thread (emit is only
        # called there).
        tput_hist: list[float] = []
        last_emit = [time.perf_counter()]

        def note_progress(n: int):
            if n <= 0 or not self.adaptive_enabled:
                return
            now = time.perf_counter()
            dt = now - last_emit[0]
            last_emit[0] = now
            if dt <= 0:
                return
            tput_hist.append(n / dt)
            if self.adaptive["escalated"] or len(tput_hist) < 5:
                return
            peak = sorted(tput_hist)[int(0.75 * (len(tput_hist) - 1))]
            if tput_hist[-1] < 0.6 * peak and tput_hist[-2] < 0.6 * peak:
                det = getattr(self.pipeline, "line_inference", None)
                event = {
                    "page": len(results),
                    "tput_recent": round(tput_hist[-1], 2),
                    "tput_p75": round(peak, 2),
                    "detect_ahead": {"from": self.detect_ahead, "to": 16},
                }
                self.detect_ahead = max(self.detect_ahead, 16)
                if det is not None and not getattr(det, "pack_input", True):
                    det.pack_input = True
                    event["pack_input"] = True
                self.adaptive["escalated"] = True
                self.adaptive["events"].append(event)

        def emit(recs: list[PageRecord]):
            results.extend(recs)
            if on_page_done:
                for r in recs:
                    on_page_done(r)
            note_progress(len(recs))

        # one background flush worker keeps recognition + decode
        # overlapping the next window's detection and host geometry; its
        # streaming carry spans windows (see _StreamFlusher)
        flusher = _StreamFlusher(
            self.pipeline, target_encoding, self.stream_quantum,
            self.max_held_pages,
        )
        flush_pool = ThreadPoolExecutor(max_workers=1)
        pending = None

        def start_flush(window, final: bool = False):
            nonlocal pending
            if pending is not None:
                emit(pending.result())
            pending = flush_pool.submit(flusher.add_window, window, final)

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
                    # self.detect_ahead is read fresh each iteration so the
                    # adaptive escalation deepens the queue mid-run
                    while len(inflight) > self.detect_ahead:
                        process(inflight.popleft())
                while inflight:
                    process(inflight.popleft())
            finally:
                geo_pool.shutdown(wait=False)
            # final flush: the (possibly empty) partial window plus every
            # bucket still carried in the streaming state
            start_flush(window, final=True)
            if pending is not None:
                emit(pending.result())
        finally:
            flush_pool.shutdown(wait=False)
            load_pool.shutdown(wait=False)
        return results
