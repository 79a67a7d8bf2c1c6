"""Device inference engines: tiled segmentation and bucketed recognition.

TPU-first rework of the reference's ONNX session wrappers
(reference: BDRC/inference.py:121-276 Detection/LineDetection/LayoutDetection,
:279-429 OCRInference):

- the whole page preprocess (resize, pad-255, binarize 51/13, normalize,
  tile) is ONE jitted program per page geometry (LRU-cached — volumes are
  shape-homogeneous, so in steady state everything reuses one executable);
- detection runs over fixed-size tile chunks so XLA compiles a single batch
  shape regardless of page size;
- recognition batches MANY lines per device call into a small set of static
  width buckets (the reference ran the recognizer one line at a time,
  inference.py:630-635 — the single biggest throughput sink), and CTC greedy
  decode runs on device so only token ids come back;
- with a ``jax.sharding.Mesh``, both engines shard their batch dimension
  (tile chunks / line-bucket batches) over the ``data`` axis: params are
  replicated once, forwards are jitted with NamedSharding in/out specs, and
  XLA inserts the collectives. The reference has no multi-device execution
  at all (SURVEY §2.3); this is BASELINE config 5's data-parallel path.
"""

from __future__ import annotations

import os
import sys
from collections import OrderedDict
from typing import Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ocr_inference_tpu.core.data import (
    BatchConfig,
    KenLMConfig,
    LayoutDetectionConfig,
    LineDetectionConfig,
    OCRModelConfig,
)
from ocr_inference_tpu.decode.ctc import (
    greedy_decode_packed,
    unpack_greedy_host,
)
from ocr_inference_tpu.decode.decoder import CTCDecoder
from ocr_inference_tpu.ops import imaging, packing, pallas_kernels, tiling
from ocr_inference_tpu.parallel.mesh import (
    DATA_AXIS,
    replicate_params,
    replicated,
    shard_params_tp,
)


_H2D_MBPS: float | None = None


def _h2d_bandwidth_mbps() -> float:
    """One-shot measured host->device bandwidth (cached per process).

    Uploads a 4 MB buffer to the default device and times upload + a
    scalar-consuming readback, subtracting a measured empty round trip —
    coarse, but the decision it feeds (bit-packed detection uploads) only
    needs an order of magnitude: tunnel phases measure 35-1300 MB/s, PCIe
    is >1 GB/s."""
    global _H2D_MBPS
    if _H2D_MBPS is not None:
        return _H2D_MBPS
    try:
        import time

        buf = np.zeros((4 * 1024 * 1024,), np.uint8)
        consume = jax.jit(lambda x: jnp.sum(x[:: 65536].astype(jnp.int32)))
        # warm BOTH shapes' compiles before timing anything: an unwarmed
        # (64,)-shape call would put its XLA compile (minutes cold over the
        # axon tunnel) into rtt, clamping dt to the 1e-4 floor and reporting
        # ~40 GB/s — disabling packed uploads exactly on the slow transports
        # the probe exists to detect (round-4 advisory, ADVICE.md)
        float(consume(jax.device_put(buf)))
        float(consume(jax.device_put(buf[:64])))
        t0 = time.perf_counter()
        float(consume(jax.device_put(buf[:64])))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(consume(jax.device_put(buf)))
        dt = max(time.perf_counter() - t0 - rtt, 1e-4)
        _H2D_MBPS = buf.nbytes / dt / 1e6
    except Exception:
        _H2D_MBPS = 1e9  # probe failed: assume fast, keep uploads simple
    return _H2D_MBPS


class _HostBufferPool:
    """Recycled host-side upload buffers.

    The round-4 500-page soak leaked ~5.5 MB RSS/page; docs/PERFORMANCE.md
    attributes it to the axon relay client's per-transfer bookkeeping on
    ever-fresh host buffers (the soak cycles 96 page arrays by reference,
    but every page built NEW packed-tile upload arrays). Reusing the same
    buffer identities per page geometry caps that growth. Buffers recycle
    only AFTER the page's device chain resolved (the packed-mask D2H
    implies every upstream H2D completed), so reuse is safe even if the
    transport stages uploads asynchronously."""

    MAX_FREE = 16  # per key; in-flight depth is bounded by detect_ahead

    def __init__(self):
        import threading

        self._free: dict = {}
        self._lock = threading.Lock()

    def acquire(self, key, shape, dtype) -> np.ndarray:
        with self._lock:
            lst = self._free.get(key)
            if lst:
                return lst.pop()
        return np.empty(shape, dtype)

    def release(self, key, buf: np.ndarray) -> None:
        with self._lock:
            lst = self._free.setdefault(key, [])
            if len(lst) < self.MAX_FREE:
                lst.append(buf)


class _ShapeLRU:
    """Tiny LRU for per-geometry jitted callables."""

    def __init__(self, capacity: int = 16):
        self._d: OrderedDict = OrderedDict()
        self._cap = capacity

    def get(self, key, builder):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        fn = builder()
        self._d[key] = fn
        if len(self._d) > self._cap:
            self._d.popitem(last=False)
        return fn


# ---------------------------------------------------------------------------
# Segmentation
# ---------------------------------------------------------------------------

class SegmentationEngine:
    """Page -> class mask(s), fully on device.

    ``mode="line"`` reproduces LineDetection.predict (sigmoid, threshold 0.9,
    binary mask *255, reference: inference.py:166-183); ``mode="layout"``
    reproduces LayoutDetection.predict (softmax over classes, threshold 0.8,
    per-class masks *255, reference: inference.py:186-276).
    """

    def __init__(
        self,
        model,
        variables,
        mode: str = "line",
        patch_size: int = 512,
        tile_chunk: int = 32,
        classes: Optional[list[str]] = None,
        mesh: Optional[Mesh] = None,
        use_pallas: Optional[bool] = None,
        pack_input: Optional[bool] = None,
        fused_page: Optional[bool] = None,
        open_width_frac: float = 0.0,
    ):
        self.model = model
        self.variables = variables
        self.mode = mode
        self.patch_size = patch_size
        self.tile_chunk = tile_chunk
        self.classes = classes or ["line"]
        self.mesh = mesh
        # Horizontal binary opening on the thresholded line mask (fraction
        # of page width; 0 disables). Deliberate divergence from the
        # reference's raw-threshold mask: the space-to-depth UNet leaves
        # narrow tile-edge artifacts (measured w<=15 px columns at x>=1009
        # on 1024-wide eval pages) that pass the reference's 1%-width
        # contour filter (line_detection.py:247-264) and then corrupt row
        # grouping (two real lines merged through a between-rows blob ->
        # empty recognition). Erasing components narrower than ~2% of the
        # page width on device — two fused 1-D reduce_windows, ~free — is
        # gated by the end-to-end CER loop (bocr-selftrain), enabled by the
        # builder only for stem_stride>1 detectors.
        self.open_width_frac = open_width_frac
        self.use_pallas = (
            pallas_kernels.pallas_enabled() if use_pallas is None else use_pallas
        )
        if pack_input is None:
            # The packed upload trades ~60-80ms of host binarize per page
            # for 8x less H2D. Plentiful cores: always worth it. On a
            # starved (1-2 core) host the answer depends on the TRANSPORT,
            # not the cores: round-3 measured pack losing there (4.5 -> 2.8
            # pages/s) in a fast-H2D tunnel phase, but round 4 measured it
            # 2x ahead (10.8 -> 20.6 pages/s, adjacent interleaved A/B)
            # once VolumeRunner's detect_ahead queue let the binarize
            # overlap device work in a 35 MB/s phase. So auto mode on a
            # low-core host probes the actual H2D bandwidth once (~0.2 s)
            # and packs when it is below ~250 MB/s — the break-even where
            # the bytes saved outweigh the host binarize.
            if (os.cpu_count() or 1) > 2:
                pack_input = True
            else:
                pack_input = _h2d_bandwidth_mbps() < 250.0
        self.pack_input = pack_input
        if fused_page is None:
            env = os.environ.get("OCR_FUSED_DETECT")
            if env is not None:
                fused_page = env == "1"
            else:
                # One whole-page program minimizes dispatches and HBM
                # round trips — the right default on a locally attached
                # chip. Over the experimental axon relay, however,
                # program-granular pipelining wins (separate pre/forward/
                # post programs overlap transfer with execution; measured
                # medians 7.2 vs 3.5 pages/s on the 12-page volume), so
                # fused defaults off there.
                try:
                    fused_page = jax.devices()[0].platform != "axon"
                except Exception:
                    fused_page = True
        self.fused_page = fused_page
        self._pre_cache = _ShapeLRU()
        self._post_cache = _ShapeLRU()
        self._upload_pool = _HostBufferPool()

        if mesh is not None:
            # DP: tile batch split over the data axis (a sharding constraint
            # inside the program — GSPMD inserts the scatter/gather), params
            # replicated; logits return replicated for the whole-page stitch.
            self.variables = replicate_params(mesh, variables)
            batch_shd = NamedSharding(mesh, P(DATA_AXIS))

            def _forward(variables, tiles):
                tiles = jax.lax.with_sharding_constraint(tiles, batch_shd)
                return self.model.apply(variables, tiles, train=False)

            self._forward = jax.jit(_forward, out_shardings=replicated(mesh))
        else:

            def _forward(variables, tiles):
                return self.model.apply(variables, tiles, train=False)

            self._forward = jax.jit(_forward)

    # -- jitted stages --

    def _pre_fn(self, plan: tiling.PagePlan, gray_input: bool):
        key = (plan.orig_h, plan.orig_w, plan.padded_h, plan.padded_w,
               gray_input)

        def build():
            def fn(img):
                padded = tiling.preprocess_page(img, plan)
                tiles = tiling.tile_page(padded, self.patch_size)
                if gray_input:
                    tiles = tiles[..., 0]  # (N, p, p) gray
                # binarize per tile, as the reference does
                # (inference.py:132-139) — the adaptive window does not see
                # across tile borders
                if self.use_pallas:
                    # fused blur+threshold, one VMEM pass per tile
                    bw1 = pallas_kernels.binarize_tiles_pallas(tiles)
                elif gray_input:
                    bw1 = jax.vmap(imaging.adaptive_threshold_gaussian)(tiles)
                else:
                    bw1 = jax.vmap(imaging.binarize)(tiles)[..., 0]
                bw = jnp.repeat(bw1[..., None], 3, axis=-1)
                return bw.astype(jnp.float32) / 255.0

            if self.mesh is not None:
                # keep the tile stack on the mesh so the sharded forward can
                # reshard it without a host round trip
                return jax.jit(fn, out_shardings=replicated(self.mesh))
            return jax.jit(fn)

        return self._pre_cache.get(key, build)

    def _pre_packed_fn(self, plan: tiling.PagePlan):
        """Jitted unpack of host-binarized, bit-packed tiles: (N, p, n32)
        int32 -> (N, p, p, 3) float tiles in [0, 1] — exactly what _pre_fn
        produces, minus the on-device binarize (it already happened on host,
        with cv2 itself, so this path is reference-exact by construction)."""
        key = ("packed", plan.n_tiles)

        def build():
            def fn(packed):
                bits = packing.unpack_bits_device(packed, self.patch_size)
                bw = jnp.repeat(bits[..., None], 3, axis=-1)
                return bw.astype(jnp.float32)

            if self.mesh is not None:
                return jax.jit(fn, out_shardings=replicated(self.mesh))
            return jax.jit(fn)

        return self._pre_cache.get(key, build)

    def _pack_tiles_host(self, gray: np.ndarray, plan: tiling.PagePlan):
        """Host half of the packed-input path: pad-255, tile, binarize each
        tile with cv2 (the reference binarizes per tile, inference.py:132-139),
        pack to int32 words. 8x less H2D traffic than the uint8 gray page —
        the page upload dominates detection cost over slow transports.

        Returns (pool_key, packed_buffer): the upload array comes from the
        engine's recycled buffer pool (see _HostBufferPool — fresh
        per-transfer buffers were the leading suspect of the r4 soak's RSS
        leak); the caller must release it once the page's device chain has
        resolved."""
        from ocr_inference_tpu.core.config import BINARIZE_BLOCK, BINARIZE_C

        p = self.patch_size
        padded = np.full((plan.padded_h, plan.padded_w), 255, np.uint8)
        padded[: plan.resized_h, : plan.resized_w] = gray
        tiles = (
            padded.reshape(plan.y_steps, p, plan.x_steps, p)
            .transpose(0, 2, 1, 3)
            .reshape(plan.n_tiles, p, p)
        )
        bw = np.empty_like(tiles)
        for i in range(plan.n_tiles):
            cv2.adaptiveThreshold(
                np.ascontiguousarray(tiles[i]), 255,
                cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY,
                BINARIZE_BLOCK, BINARIZE_C, dst=bw[i],
            )
        packed = packing.pack_bits_host(bw)
        key = ("packed_tiles", packed.shape)
        buf = self._upload_pool.acquire(key, packed.shape, packed.dtype)
        np.copyto(buf, packed)
        return key, buf

    @staticmethod
    def _open_horizontal(mask: jnp.ndarray, k: int) -> jnp.ndarray:
        """Binary opening with a 1 x k structuring element (erode+dilate as
        two fused 1-D reduce_windows): erases components narrower than k
        while leaving wider ones bit-identical. Zero padding on the erosion
        so page-edge blobs (where the stem2 artifacts live) are erased too."""
        x = mask.astype(jnp.float32)
        lo, hi = k // 2, k - 1 - k // 2
        xp = jnp.pad(x, ((0, 0), (lo, hi)))
        er = -jax.lax.reduce_window(
            -xp, -jnp.inf, jax.lax.max, (1, k), (1, 1), "VALID"
        )
        dp = jnp.pad(er, ((0, 0), (hi, lo)))
        di = jax.lax.reduce_window(
            dp, -jnp.inf, jax.lax.max, (1, k), (1, 1), "VALID"
        )
        return di > 0.5

    def _post_body(self, logits_tiles, plan: tiling.PagePlan,
                   threshold: float):
        """Traceable post chain: logits tiles -> bit-packed page mask."""
        if self.mode == "line":
            # (N, p, p, 1) -> (N, p, p)
            pred = jax.nn.sigmoid(logits_tiles[..., 0])
            pred = jnp.where(pred > threshold, 1.0, 0.0)
            merged = tiling.stitch_tiles(pred, plan.y_steps)
            merged = tiling.crop_padding(merged, plan.pad_x, plan.pad_y)
            out = imaging.resize_bilinear(merged, plan.orig_h, plan.orig_w)
            # reference truncates (astype uint8) before *255
            # (inference.py:178-181): >= 1.0 survives
            m = out >= 1.0
            if self.open_width_frac > 0:
                k = max(int(plan.orig_w * self.open_width_frac) | 1, 3)
                m = self._open_horizontal(m, k)
            return packing.pack_mask(m)
        pred = jax.nn.softmax(logits_tiles, axis=-1)
        pred = jnp.where(pred > threshold, 1.0, 0.0)
        merged = tiling.stitch_tiles(pred, plan.y_steps)
        merged = tiling.crop_padding(merged, plan.pad_x, plan.pad_y)
        out = imaging.resize_bilinear(merged, plan.orig_h, plan.orig_w)
        # (H, W, C) -> (C, H, W) so packing runs along W
        return packing.pack_mask(jnp.transpose(out, (2, 0, 1)) >= 1.0)

    def _post_fn(self, plan: tiling.PagePlan, threshold: float, n_classes: int):
        key = (plan.orig_h, plan.orig_w, plan.padded_h, plan.padded_w,
               threshold, n_classes, self.mode, self.open_width_frac)

        def build():
            def fn(logits_tiles):
                return self._post_body(logits_tiles, plan, threshold)

            if self.mesh is not None:
                return jax.jit(fn, out_shardings=replicated(self.mesh))
            return jax.jit(fn)

        return self._post_cache.get(key, build)

    def _fused_fn(self, plan: tiling.PagePlan, threshold: float,
                  gray_input: bool):
        """ONE jitted program for a whole page: u8 page -> packed mask words.

        Fuses pre (pad / tile / binarize / normalize), the tiled forward,
        and post (threshold / stitch / crop / resize / pack) into a single
        dispatch with no intermediate HBM round trips. Over the device
        tunnel the three-stage path pays per-call dispatch latency three
        times and materializes a 75MB float tile stack between programs;
        fused, the page costs one H2D (u8 gray), one program, one tiny D2H.
        Only built when the page fits one forward chunk
        (plan.n_tiles <= tile_chunk); bigger pages take the staged path."""
        key = ("fused", plan.orig_h, plan.orig_w, plan.padded_h,
               plan.padded_w, threshold, gray_input, self.mode,
               self.open_width_frac)

        def build():
            def fn(variables, img):
                padded = tiling.preprocess_page(img, plan)
                tiles = tiling.tile_page(padded, self.patch_size)
                if gray_input:
                    tiles = tiles[..., 0]
                if self.use_pallas:
                    bw1 = pallas_kernels.binarize_tiles_pallas(tiles)
                elif gray_input:
                    bw1 = jax.vmap(imaging.adaptive_threshold_gaussian)(tiles)
                else:
                    bw1 = jax.vmap(imaging.binarize)(tiles)[..., 0]
                x = jnp.repeat(bw1[..., None], 3, axis=-1)
                # 0/255 -> exact 0.0/1.0 before any model-dtype cast
                x = x.astype(jnp.float32) / 255.0
                if self.mesh is not None:
                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(self.mesh, P(DATA_AXIS))
                    )
                logits = self.model.apply(variables, x, train=False)
                return self._post_body(logits, plan, threshold)

            if self.mesh is not None:
                return jax.jit(fn, out_shardings=replicated(self.mesh))
            return jax.jit(fn)

        return self._pre_cache.get(key, build)

    def _run_tiles(self, tiles: jax.Array) -> jax.Array:
        """Forward all tiles in fixed-size chunks.

        Single-chunk pages round their tile count up to a multiple of 8:
        the common whole-page counts (8/16/24/32) run EXACT — a 24-tile
        page pays zero padding, where next-pow2 rounding padded it to 32 —
        while heterogeneous volumes compile at most tile_chunk/8 forward
        shapes (first compiles over slow transports cost minutes each, so
        one-shape-per-distinct-page-size would be pathological).
        Multi-chunk pages use the configured tile_chunk."""
        n = tiles.shape[0]
        chunk = min(-(-n // 8) * 8, self.tile_chunk)
        if self.mesh is not None:
            dp = self.mesh.shape[DATA_AXIS]
            chunk = -(-chunk // dp) * dp
        outs = []
        for start in range(0, n, chunk):
            block = tiles[start : start + chunk]
            if block.shape[0] < chunk:
                pad = chunk - block.shape[0]
                block = jnp.concatenate(
                    [block, jnp.zeros((pad,) + block.shape[1:], block.dtype)]
                )
                outs.append(self._forward(self.variables, block)[: n - start])
            else:
                outs.append(self._forward(self.variables, block))
        return jnp.concatenate(outs) if len(outs) > 1 else outs[0]

    def _dispatch_tiles(self, image: np.ndarray):
        """Host prep + async device pre for one page ->
        (plan, tiles, release).

        When the plan has no resize, grayscale on host (bit-exact with the
        device op) and — with pack_input — binarize on host too, so the page
        uploads as packed bits (8x less H2D than uint8 gray). With a resize,
        channel order matters (gray-of-resized != resized-gray by +/-1
        fixed-point counts), so RGB goes up unchanged and everything runs on
        device.

        ``release`` (may be None) returns the page's pooled upload buffer;
        the caller must invoke it once the page's device chain resolved
        (the mask resolver does)."""
        h, w = image.shape[:2]
        plan = tiling.plan_page(h, w, self.patch_size)
        arr = np.asarray(image)
        gray_input = (
            arr.ndim == 3
            and (plan.resized_h, plan.resized_w) == (plan.orig_h, plan.orig_w)
        )
        release = None
        if gray_input and self.pack_input:
            gray = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY)
            key, buf = self._pack_tiles_host(gray, plan)
            release = lambda: self._upload_pool.release(key, buf)  # noqa: E731
            tiles = self._pre_packed_fn(plan)(buf)
        else:
            if gray_input:
                gray = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY)[..., None]
                key = ("gray_page", gray.shape)
                buf = self._upload_pool.acquire(key, gray.shape, gray.dtype)
                np.copyto(buf, gray)
                release = lambda: self._upload_pool.release(key, buf)  # noqa: E731
                arr = buf
            # numpy input stays uncommitted, so the same call works whether
            # the pre program runs on one device or a mesh
            tiles = self._pre_fn(plan, gray_input)(arr)
        return plan, tiles, release

    # -- public API --

    def predict_async(
        self, image: np.ndarray, class_threshold: float | None = None
    ):
        """Dispatch a full-page prediction; returns a zero-arg resolver.

        Every device program (pre, tiled forward, post/pack) is enqueued
        asynchronously — only the resolver's D2H of the bit-packed mask
        blocks. VolumeRunner uses this to overlap page i's host geometry
        with page i+1's detection (the reference is strictly synchronous,
        inference.py:488-506)."""
        if class_threshold is None:
            class_threshold = 0.9 if self.mode == "line" else 0.8
        h, w = image.shape[:2]
        plan = tiling.plan_page(h, w, self.patch_size)
        if (self.fused_page and plan.n_tiles <= self.tile_chunk
                and not self.pack_input):
            # single-chunk page: the whole detection chain is one program
            arr = np.asarray(image)
            gray_input = (
                arr.ndim == 3
                and (plan.resized_h, plan.resized_w)
                == (plan.orig_h, plan.orig_w)
            )
            if gray_input:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY)[..., None]
            packed_dev = self._fused_fn(plan, class_threshold, gray_input)(
                self.variables, arr
            )
            return self._mask_resolver(packed_dev, w)
        plan, tiles, release = self._dispatch_tiles(image)
        logits = self._run_tiles(tiles)
        n_classes = logits.shape[-1]
        packed_dev = self._post_fn(plan, class_threshold, n_classes)(logits)
        return self._mask_resolver(packed_dev, image.shape[1], release)

    def _mask_resolver(self, packed_dev, w: int, release=None):
        """Zero-arg resolver for a dispatched bit-packed mask; its D2H of
        the packed words (32x less traffic than uint8) is the only blocking
        point of the whole detection chain. Recycles the page's pooled
        upload buffer once the chain has provably consumed it."""

        def resolve():
            try:
                bits = packing.unpack_mask(np.asarray(packed_dev), w)
            finally:
                if release is not None:
                    release()
            if self.mode == "line":
                return (bits * 255).astype(np.uint8)
            # (C, H, W) -> (H, W, C)
            return (np.transpose(bits, (1, 2, 0)) * 255).astype(np.uint8)

        return resolve

    def predict(self, image: np.ndarray, class_threshold: float | None = None):
        """Full-page prediction; returns a uint8 mask (line mode: (H, W),
        layout mode: (H, W, C))."""
        return self.predict_async(image, class_threshold)()

    def predict_many_async(
        self,
        images: Sequence[np.ndarray],
        class_threshold: float | None = None,
    ):
        """Many-pages-one-tensor detection; returns one resolver per page.

        The TPU equivalent of the reference's batched torch path
        (multi_image_collate_fn + infer_batch, BDRC/utils.py:1142-1237,
        minus its first-image-only return bug): every page's tiles join ONE
        device tile stream, so forward chunks fill completely across page
        boundaries instead of running ragged per-page remainders. Pages may
        have different sizes — tiles are uniformly (patch, patch)."""
        if not images:
            return []
        if class_threshold is None:
            class_threshold = 0.9 if self.mode == "line" else 0.8
        plans = []
        stacks = []
        releases = []
        for image in images:
            plan, tiles, release = self._dispatch_tiles(image)
            plans.append(plan)
            stacks.append(tiles)
            releases.append(release)
        all_logits = self._run_tiles(
            stacks[0] if len(stacks) == 1 else jnp.concatenate(stacks)
        )
        n_classes = all_logits.shape[-1]

        resolvers = []
        start = 0
        for image, plan, release in zip(images, plans, releases):
            logits = all_logits[start : start + plan.n_tiles]
            start += plan.n_tiles
            packed_dev = self._post_fn(plan, class_threshold, n_classes)(
                logits
            )
            resolvers.append(
                self._mask_resolver(packed_dev, image.shape[1], release)
            )
        return resolvers

    def predict_many_batched(
        self,
        items,
        batch_size: int = 4,
        class_threshold: float | None = None,
    ):
        """Generator over (key, image) pairs yielding (key, image, mask),
        grouping pages into batch_size-sized predict_many_async calls —
        the accumulate/flush loop shared by the bulk CLIs."""
        batch: list = []

        def flush():
            resolvers = self.predict_many_async(
                [img for _, img in batch], class_threshold=class_threshold
            )
            for (key, img), resolve in zip(batch, resolvers):
                yield key, img, resolve()
            batch.clear()

        for key, image in items:
            batch.append((key, image))
            if len(batch) >= max(1, batch_size):
                yield from flush()
        if batch:
            yield from flush()


# ---------------------------------------------------------------------------
# Recognition
# ---------------------------------------------------------------------------

class StreamState:
    """Cross-call carry for RecognitionEngine's streaming API: prepared
    line canvases grouped by width bucket, each tagged with the caller's
    token. Owned by one consumer thread (VolumeRunner's flush worker)."""

    def __init__(self):
        self.by_width: dict[int, list] = {}

    def pending(self) -> int:
        return sum(len(v) for v in self.by_width.values())

def pad_ocr_line_host(
    img: np.ndarray,
    target_width: int,
    target_height: int,
    padding: str = "black",
) -> np.ndarray:
    """Host (numpy/cv2) aspect-preserving canvas pad, byte-parity with the
    reference (BDRC/utils.py:818-899, inference.py:313-334). Used to build
    static-shape line batches cheaply before the device call.

    One implementation: delegates to the differentially pinned
    ops_host.pad_ocr_line (byte-equal vs the reference's own code in
    tests/test_reference_diff.py), guaranteeing a 3-D (H, W, C) result for
    the engines' batch stacking."""
    from ocr_inference_tpu.ops_host import pad_ocr_line

    out = pad_ocr_line(img, target_width, target_height, padding)
    if out.ndim == 2:
        out = out[..., None]
    return out


class RecognitionEngine:
    """Batched line recognizer (reference: OCRInference, inference.py:279-429).

    Lines are canvas-padded on host into static width buckets, batched, and
    pushed through ONE jitted program per (bucket, batch) shape that does
    binarize -> grayscale -> [-1, 1] scale -> model forward -> on-device
    greedy CTC. Eval mode returns per-line logits for host beam search.
    """

    def __init__(
        self,
        model,
        variables,
        config: OCRModelConfig,
        kenlm_config: Optional[KenLMConfig] = None,
        batch_cfg: Optional[BatchConfig] = None,
        mesh: Optional[Mesh] = None,
        use_pallas: Optional[bool] = None,
        pack_input: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.config = config
        self.batch_cfg = batch_cfg or BatchConfig()
        self.mesh = mesh
        self.use_pallas = (
            pallas_kernels.pallas_enabled() if use_pallas is None else use_pallas
        )
        # Binarize line canvases on host (cv2 — the reference's own op,
        # inference.py:336-347) and upload packed bits: 8x less H2D. Unlike
        # the detection-side trade this wins even on starved hosts — line
        # canvases are small, so the host pays ~2ms/line to skip ~8x that
        # in upload time. pack_input=False keeps binarize on device (the
        # Pallas fused path).
        self.pack_input = pack_input
        self._dp = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if mesh is not None:
            # tensor-parallel over the mesh's model axis when it has one:
            # the vocab-width head conv is split across devices
            # (parallel/mesh.py tp_shardings) and XLA partitions the head
            # matmul, all-gathering logits only at the sharded-batch output
            # boundary. A model axis of 1 degrades to plain replication.
            self.variables = shard_params_tp(mesh, variables)
        self.ctc_decoder = CTCDecoder(
            config.charset, config.add_blank, kenlm_config=None
        )
        self.ctc_decoder_lm = (
            CTCDecoder(config.charset, config.add_blank, kenlm_config)
            if kenlm_config is not None
            else None
        )
        # Shallow fusion ships guarded: calibrate_lm() can clear this when a
        # labeled sample shows the LM hurting (EVAL_r02 measured 0.892% ->
        # 1.033% with the untuned alpha=0.5) — the liability mode is then
        # unreachable through run_batch_beams(use_lm=True).
        self.lm_fusion_enabled = True
        self._fwd_cache = _ShapeLRU(capacity=32)
        # (bucket_width, real_lines, padded_batch) -> count; filled by
        # _batch_iter so volume runs can report real device occupancy
        self.occupancy: dict[tuple[int, int, int], int] = {}
        # persistent per-shape upload buffers (see _fill_upload): fresh
        # host buffers per transfer were the r4 soak-leak suspect. Safe
        # because recognition is single-consumer and every forward blocks
        # on its result (np.asarray) before the shape can be reused.
        self._upload_bufs: dict = {}
        self._packed_bufs: dict = {}

    # buckets never exceed the model's trained input width
    def _buckets(self) -> tuple[int, ...]:
        w = self.config.input_width
        bs = tuple(b for b in self.batch_cfg.width_buckets if b < w)
        return bs + (w,)

    def _prepare_host(self, line_image: np.ndarray, pre_pad: bool) -> np.ndarray:
        img = line_image
        if img.ndim == 3 and img.shape[2] == 1:
            img = img[..., 0]  # strips cut from grayscale pages
        if img.ndim == 2:
            # stay single-channel: cv2's RGB2GRAY fixed-point weights sum to
            # exactly 32768, so GRAY2RGB -> pad(3ch) -> RGB2GRAY is the
            # identity chain — pad the gray strip directly and resize/border
            # 1 channel instead of 3 (byte parity pinned in test_pipeline)
            if pre_pad:
                img = tiling.pre_pad_line(img)
            bucket = tiling.bucket_for_width(
                img.shape[1], img.shape[0], self.config.input_height,
                self._buckets(),
            )
            gray = pad_ocr_line_host(img, bucket, self.config.input_height)
            gray = gray[..., 0]
        else:
            if pre_pad:
                img = tiling.pre_pad_line(img)
            bucket = tiling.bucket_for_width(
                img.shape[1], img.shape[0], self.config.input_height,
                self._buckets(),
            )
            canvas = pad_ocr_line_host(img, bucket, self.config.input_height)
            # grayscale on host (bit-exact with the device op) so the H2D
            # transfer is 1 channel instead of 3
            gray = cv2.cvtColor(canvas, cv2.COLOR_RGB2GRAY)
        if not self.pack_input:
            return gray
        # host binarize (cv2 itself; binarize-then-gray == gray-then-
        # binarize for the repeated-channel binarize, inference.py:336-347)
        # so the canvas uploads as packed bits
        from ocr_inference_tpu.core.config import BINARIZE_BLOCK, BINARIZE_C

        return cv2.adaptiveThreshold(
            gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY,
            BINARIZE_BLOCK, BINARIZE_C,
        )

    def _forward_fn(self, batch: int, width: int, want_logits: bool):
        key = (batch, width, want_logits)

        def build():
            def fn(variables, inp):
                # -> [-1, 1] (B, H, W) input (reference line prep:
                # pad -> binarize -> gray -> scale, inference.py:336-347;
                # gray/binarize/gray collapses to gray -> adaptive threshold)
                if self.pack_input:
                    # host already binarized; input is bit-packed int32
                    bits = packing.unpack_bits_device(inp, width)
                    x = bits.astype(jnp.float32) * 2.0 - 1.0
                elif self.use_pallas and pallas_kernels.line_kernel_applicable(
                    inp.shape[1], inp.shape[2]
                ):
                    # fused blur+threshold, one VMEM pass per line
                    bw = pallas_kernels.binarize_lines_pallas(inp)
                    x = bw.astype(jnp.float32) / 127.5 - 1.0
                else:
                    bw = jax.vmap(imaging.adaptive_threshold_gaussian)(inp)
                    x = bw.astype(jnp.float32) / 127.5 - 1.0
                logits = self.model.apply(variables, x, train=False)
                if want_logits:
                    return logits
                # one packed (B, T+2) output = one D2H round trip
                return greedy_decode_packed(logits)

            if self.mesh is not None:
                # DP: line batch split over the data axis via an internal
                # sharding constraint; every output (logits or packed
                # ids/lengths/conf) is batch-leading, so one data-axis spec
                # covers them all
                batch_shd = NamedSharding(self.mesh, P(DATA_AXIS))

                def fn_mesh(variables, gray_u8):
                    gray_u8 = jax.lax.with_sharding_constraint(
                        gray_u8, batch_shd
                    )
                    return fn(variables, gray_u8)

                return jax.jit(fn_mesh, out_shardings=batch_shd)
            return jax.jit(fn)

        return self._fwd_cache.get(key, build)

    def _fill_upload(self, width: int, canvases, padded_b: int) -> np.ndarray:
        """The (padded_b, H, width) upload array with ``canvases`` in rows
        [0, n), zero padding after — built in a persistent per-shape buffer
        (packed to int32 words when pack_input). Reuse is safe because
        recognition is single-consumer and every forward blocks on its
        result before the same shape runs again."""
        key = (padded_b, width)
        arr = self._upload_bufs.get(key)
        if arr is None:
            arr = np.zeros(
                (padded_b, self.config.input_height, width), np.uint8
            )
            self._upload_bufs[key] = arr
        n = len(canvases)
        for i, c in enumerate(canvases):
            arr[i] = c
        arr[n:].fill(0)
        if not self.pack_input:
            return arr
        packed = packing.pack_bits_host(arr)
        buf = self._packed_bufs.get(key)
        if buf is None or buf.shape != packed.shape:
            buf = np.empty_like(packed)
            self._packed_bufs[key] = buf
        np.copyto(buf, packed)
        return buf

    def _batch_iter(self, prepared: list[tuple[int, np.ndarray]]):
        """Group prepared canvases by bucket width; yield fixed-size batches
        (padded with zeros so each (bucket, B) compiles once)."""
        by_width: dict[int, list[tuple[int, np.ndarray]]] = {}
        for idx, canvas in prepared:
            by_width.setdefault(canvas.shape[1], []).append((idx, canvas))
        bmax = self.batch_cfg.max_lines_per_batch
        for width, items in sorted(by_width.items()):
            for start in range(0, len(items), bmax):
                chunk = items[start : start + bmax]
                # round the batch up to {1, 2, 4, 8, 16, 24, 32, ...}:
                # multiples of 8 above 8 instead of powers of two. The r3
                # occupancy histogram showed pow2 rounding padding 33-51
                # real lines into 64-slot batches (25-50% waste); 8-steps
                # bound waste at <= 7 slots (< 18% at the batches volumes
                # run) for ~4 extra compiled shapes per bucket, amortized
                # by the persistent compilation cache.
                n = len(chunk)
                if n <= 8:
                    b = 1
                    while b < n:
                        b *= 2
                else:
                    b = -(-n // 8) * 8
                b = min(b, bmax)
                # a mesh batch must split evenly over the data axis
                b = -(-b // self._dp) * self._dp
                arr = self._fill_upload(
                    width, [canvas for _, canvas in chunk], b
                )
                key = (width, len(chunk), b)
                self.occupancy[key] = self.occupancy.get(key, 0) + 1
                yield width, b, [idx for idx, _ in chunk], arr

    # -- public API --

    def run_batch(
        self, line_images: Sequence[np.ndarray], pre_pad: bool = False
    ) -> list[str]:
        """Recognize many lines; returns texts in input order."""
        prepared = [
            (i, self._prepare_host(img, pre_pad))
            for i, img in enumerate(line_images)
            if img.shape[0] > 0 and img.shape[1] > 0
        ]
        texts: dict[int, str] = {}
        for width, b, idxs, arr in self._batch_iter(prepared):
            fn = self._forward_fn(b, width, want_logits=False)
            ids, lengths, _ = unpack_greedy_host(
                np.asarray(fn(self.variables, arr))
            )
            from ocr_inference_tpu.decode.ctc import ids_to_tokens

            for row, idx in enumerate(idxs):
                toks = ids_to_tokens(
                    ids[row],
                    int(lengths[row]),
                    self.ctc_decoder.charset,
                    self.config.add_blank,
                )
                texts[idx] = "".join(toks)
        return [texts.get(i, "") for i in range(len(line_images))]

    def run_batch_beams(
        self,
        line_images: Sequence[np.ndarray],
        pre_pad: bool = False,
        use_lm: bool = False,
        top_k: int = 10,
    ):
        """Eval mode: per-line beam hypotheses (reference run_beam_code,
        inference.py:400-414). Forward is batched on device; beam search
        runs on host over the returned logits."""
        use_lm = use_lm and self.lm_fusion_enabled
        prepared = [
            (i, self._prepare_host(img, pre_pad))
            for i, img in enumerate(line_images)
            if img.shape[0] > 0 and img.shape[1] > 0
        ]
        decoder = (
            self.ctc_decoder_lm
            if (use_lm and self.ctc_decoder_lm is not None)
            else self.ctc_decoder
        )
        beams_by_idx: dict[int, list] = {}
        for width, b, idxs, arr in self._batch_iter(prepared):
            fn = self._forward_fn(b, width, want_logits=True)
            logits = np.asarray(fn(self.variables, arr))
            # decode the whole bucket at once (vectorized prefix search;
            # scalar per-line only under LM fusion — see ctc_beam_decode_batch)
            batch_beams = decoder.ctc_beam_decode_batch(
                logits[: len(idxs)], use_lm=use_lm, top_k=top_k
            )
            for row, idx in enumerate(idxs):
                beams_by_idx[idx] = batch_beams[row]
        return [beams_by_idx.get(i, []) for i in range(len(line_images))]

    def calibrate_lm(
        self,
        line_images: Sequence[np.ndarray],
        refs: Sequence[str],
        alphas: Sequence[float] = (0.2, 0.4, 0.7, 1.0),
        betas: Sequence[float] = (-0.5, 0.0, 0.5),
        pre_pad: bool = False,
    ) -> dict:
        """Tune shallow-fusion (alpha, beta) on labeled strips; auto-disable
        fusion when no grid point beats the plain beam.

        The reference wires KenLM into pyctcdecode with fixed weights and no
        validation (reference: BDRC/inference.py:97-106); an untuned LM made
        CER strictly worse on every recorded eval (EVAL_r02: 0.892% ->
        1.033%). This guard makes that liability unreachable: the forward
        runs ONCE (logits cached per strip), each (alpha, beta) re-decodes,
        and the winner must beat the no-LM beam CER or ``lm_fusion_enabled``
        clears, turning every later ``use_lm=True`` call into a plain beam.
        ``refs`` use the pipeline text convention ("§" already a space).

        The winning grid point must ALSO beat the plain beam on a held-out
        half of the sample (tune on even lines, validate on odd): a 12-point
        grid over a couple dozen lines can find a lucky point on the tuning
        half alone, which round-4 measurement showed shipping fusion that
        then hurt on the eval distribution."""
        from ocr_inference_tpu.eval.cer import cer

        dec = self.ctc_decoder_lm
        if dec is None or not dec.has_lm:
            self.lm_fusion_enabled = False
            return {"enabled": False, "reason": "no LM loaded"}
        prepared = [
            (i, self._prepare_host(img, pre_pad))
            for i, img in enumerate(line_images)
            if img.shape[0] > 0 and img.shape[1] > 0
        ]
        logits_by_idx: dict[int, np.ndarray] = {}
        for width, b, idxs, arr in self._batch_iter(prepared):
            fn = self._forward_fn(b, width, want_logits=True)
            logits = np.asarray(fn(self.variables, arr))
            for row, idx in enumerate(idxs):
                logits_by_idx[idx] = logits[row]
        order = sorted(logits_by_idx)
        tune = order[0::2]
        hold = order[1::2] or tune  # degenerate tiny samples: no holdout

        def decode_all(subset, use_lm: bool) -> list[str]:
            texts = []
            for i in subset:
                beams = dec.ctc_beam_decode(
                    logits_by_idx[i], use_lm=use_lm, top_k=1
                )
                texts.append(
                    beams[0].text.strip().replace("§", " ") if beams else ""
                )
            return texts

        def score(subset, use_lm: bool) -> float:
            return cer(decode_all(subset, use_lm), [refs[i] for i in subset])

        base_tune = score(tune, False)
        best_a = best_b = None
        best = base_tune
        grid = []
        for a in alphas:
            for b_ in betas:
                dec.lm_alpha, dec.lm_beta = a, b_
                c = score(tune, True)
                grid.append([a, b_, round(c, 5)])
                if c < best:
                    best_a, best_b, best = a, b_, c
        report = {
            "cer_beam": round(base_tune, 5),
            "grid": grid,
            "lines": len(order),
        }
        if best_a is not None:
            # holdout gate: the chosen point must not lose on unseen lines
            dec.lm_alpha, dec.lm_beta = best_a, best_b
            base_hold = score(hold, False)
            lm_hold = score(hold, True)
            report.update(
                cer_beam_holdout=round(base_hold, 5),
                cer_beam_lm_holdout=round(lm_hold, 5),
            )
            if lm_hold > base_hold:
                best_a = None
        if best_a is None:
            self.lm_fusion_enabled = False
            print(
                "LM fusion auto-disabled: no (alpha, beta) beat the plain "
                f"beam on both calibration halves (tune CER {base_tune:.4f})",
                file=sys.stderr,
            )
            report.update(enabled=False)
        else:
            self.lm_fusion_enabled = True
            dec.lm_alpha, dec.lm_beta = best_a, best_b
            report.update(
                enabled=True, alpha=best_a, beta=best_b,
                cer_beam_lm=round(best, 5),
            )
        return report

    # -- streaming recognition (cross-window carry) --
    #
    # run_batch pads each bucket's lines to an 8-step batch shape, which
    # bounds waste but lets EVERY distinct line count compile a new
    # (bucket, batch) program — BENCH_r04 measured rec_fwd jit entries
    # growing 9 -> 15 inside the timed soak and 53 batch-1 device calls on
    # the wide buckets (w2500/w3000 never fill within one window). The
    # streaming API instead carries under-full buckets ACROSS windows and
    # restricts every forward to a closed shape set: full batches of
    # ``quantum`` plus power-of-two remainders — so steady state runs one
    # shape per bucket, remainders reuse pre-warmed shapes (warm_shapes),
    # and batch-1 calls only happen for a genuinely lone final line
    # (VERDICT r4 item 7; reference hot loop: inference.py:630-635).

    STREAM_QUANTUM = 32

    def stream_state(self) -> "StreamState":
        """Fresh carry state for one streaming run (one volume / serve
        burst)."""
        return StreamState()

    def stream_add(self, state: "StreamState", token, line_image: np.ndarray,
                   pre_pad: bool = False) -> None:
        """Prepare one line into its width bucket under ``token`` (any
        hashable caller id); it resolves in a later stream_run."""
        canvas = self._prepare_host(line_image, pre_pad)
        state.by_width.setdefault(canvas.shape[1], []).append((token, canvas))

    def _stream_chunk(self, width: int, chunk, padded_b: int) -> dict:
        """One forward at the fixed (padded_b, width) shape -> token->text."""
        from ocr_inference_tpu.decode.ctc import ids_to_tokens

        arr = self._fill_upload(
            width, [canvas for _, canvas in chunk], padded_b
        )
        key = (width, len(chunk), padded_b)
        self.occupancy[key] = self.occupancy.get(key, 0) + 1
        fn = self._forward_fn(padded_b, width, want_logits=False)
        ids, lengths, _ = unpack_greedy_host(
            np.asarray(fn(self.variables, arr))
        )
        out = {}
        for row, (token, _) in enumerate(chunk):
            toks = ids_to_tokens(
                ids[row], int(lengths[row]), self.ctc_decoder.charset,
                self.config.add_blank,
            )
            out[token] = "".join(toks)
        return out

    def _stream_quantum(self, quantum: Optional[int]) -> int:
        q = quantum or self.STREAM_QUANTUM
        q = min(q, self.batch_cfg.max_lines_per_batch)
        return -(-q // self._dp) * self._dp  # mesh batches split evenly

    def stream_run(
        self,
        state: "StreamState",
        final: bool = False,
        force_tokens=(),
        quantum: Optional[int] = None,
    ) -> dict:
        """Recognize what can run at full occupancy; returns token->text.

        Buckets flush in chunks of ``quantum``; remainders stay carried
        unless ``final`` or the bucket holds a token in ``force_tokens``
        (the caller's page-holding bound), in which case the remainder runs
        at the next power-of-two shape (<= 2x padding on a tail call, zero
        new shapes beyond the warm set)."""
        force = set(force_tokens)
        q = self._stream_quantum(quantum)
        out: dict = {}
        for width in sorted(state.by_width):
            lst = state.by_width[width]
            flush_all = final or (
                bool(force) and any(t in force for t, _ in lst)
            )
            while len(lst) >= q:
                chunk = lst[:q]
                del lst[:q]
                out.update(self._stream_chunk(width, chunk, q))
            if flush_all and lst:
                chunk = lst[:]
                lst.clear()
                b = 1
                while b < len(chunk):
                    b *= 2
                b = -(-min(b, q) // self._dp) * self._dp
                out.update(self._stream_chunk(width, chunk, b))
        for w in [w for w, lst in state.by_width.items() if not lst]:
            del state.by_width[w]
        return out

    def warm_shapes(self, widths=None, quantum: Optional[int] = None) -> int:
        """Pre-compile (and execute once, on zeros) every forward shape the
        streaming path can emit — {1, 2, 4, ..., quantum} per bucket — so a
        timed volume run starts with its full shape set resident
        (jit-cache end == start, VERDICT r4 item 7). Returns the number of
        shapes warmed. With the persistent compilation cache only the first
        process ever pays the compiles."""
        if widths is None:
            widths = self._buckets()
        q = self._stream_quantum(quantum)
        batches = set()
        b = 1
        while b < q:
            batches.add(-(-b // self._dp) * self._dp)
            b *= 2
        batches.add(q)
        n = 0
        for width in widths:
            for bb in sorted(batches):
                fn = self._forward_fn(bb, width, want_logits=False)
                arr = np.zeros(
                    (bb, self.config.input_height, width), np.uint8
                )
                if self.pack_input:
                    arr = packing.pack_bits_host(arr)
                np.asarray(fn(self.variables, arr))
                n += 1
        return n

    def run(self, line_image: np.ndarray, pre_pad: bool = False,
            use_lm: bool = False) -> str:
        """Single-line compatibility shim (reference: inference.py:416-429)."""
        return self.run_batch([line_image], pre_pad=pre_pad)[0]

    def run_beam_code(self, line_image: np.ndarray, pre_pad: bool = True):
        return self.run_batch_beams([line_image], pre_pad=pre_pad)[0]
