"""Synthetic pecha pages with exact ground truth — the offline accuracy loop.

The reference's accuracy story rests on published checkpoints + the
Uchan-OCR-EVAL set (reference: BDRC/inference.py:964-1040), neither reachable
from this sandbox. This module closes the loop without network: a
deterministic synthetic script (one generated glyph per charset token),
rendered into page images with line masks and transcripts, so the FULL
pipeline — detection, geometry, strip extraction, recognition, CTC decode,
text assembly — can be trained and CER-scored end to end
(VERDICT round 1, item 4).

The glyphs are random strokes, but fixed per (token, seed): a real written
script for the models, meaningless to humans, measurable to the harness.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import cv2
import numpy as np

# Wylie-token charset (the convention the published recognizers use:
# reference charsets are Wylie units incl. the "§" tsheg placeholder,
# BDRC/label_encoder.py:35-55)
WYLIE_CHARSET: tuple[str, ...] = (
    "k", "kh", "g", "ng", "c", "ch", "j", "ny", "t", "th", "d", "n",
    "p", "ph", "b", "m", "ts", "tsh", "dz", "w", "zh", "z", "'", "y",
    "r", "l", "sh", "s", "h", "a", "i", "u", "e", "o", "§",
)

# Realistic-scale charset (77 units, the size of the published recognizers'
# Wylie charsets — reference model configs carry ~77-80 units incl. stacks,
# utils.py:349-393 "charset"): the 35 base units plus retroflex/Sanskrit
# letters and the common subjoined/superscribed consonant stacks, each a
# single charset unit exactly as the reference's stack-aware encoders treat
# them (BDRC/label_encoder.py:104-125). Each token gets its own glyph, so
# the recognizer faces a genuinely 77-way classification.
WYLIE_CHARSET_FULL: tuple[str, ...] = WYLIE_CHARSET + (
    # retroflex / Sanskrit transliteration
    "T", "Th", "D", "N", "Sh",
    # ra-ta stacks (subjoined r)
    "kr", "khr", "gr", "pr", "phr", "br", "mr",
    # ya-ta stacks (subjoined y)
    "ky", "khy", "gy", "py", "phy", "by", "my",
    # ra-mgo stacks (superscribed r)
    "rk", "rg", "rng", "rj", "rny", "rt", "rd", "rn", "rb", "rm",
    "rts", "rdz",
    # sa-mgo stacks (superscribed s)
    "sk", "sg", "sng", "sny", "st", "sd", "sn", "sp", "sb", "sm", "sts",
)
assert len(WYLIE_CHARSET_FULL) == 77


def _token_rng(token: str, seed: int) -> np.random.RandomState:
    digest = hashlib.sha256(f"{seed}:{token}".encode()).digest()
    return np.random.RandomState(int.from_bytes(digest[:4], "little"))


@dataclass
class GlyphSet:
    """Deterministic glyph bitmaps, one per charset token."""

    charset: tuple[str, ...] = WYLIE_CHARSET
    height: int = 40
    seed: int = 7
    _cache: dict = field(default_factory=dict)

    def glyph(self, token: str) -> np.ndarray:
        """Ink mask (h, w) uint8 in {0, 255} for one token."""
        got = self._cache.get(token)
        if got is not None:
            return got
        rng = _token_rng(token, self.seed)
        h = self.height
        if token == "§":
            # tsheg: a small high dot, like the real separator
            w = max(h // 5, 4)
            g = np.zeros((h, w), np.uint8)
            cv2.circle(g, (w // 2, h // 4), max(w // 3, 1), 255, -1)
        else:
            w = int(rng.randint(h // 2, h))
            g = np.zeros((h, w), np.uint8)
            # a head line (pecha scripts hang from a top stroke) + strokes
            cv2.line(g, (1, 3), (w - 2, 3), 255, 2)
            for _ in range(int(rng.randint(2, 5))):
                kind = rng.randint(0, 3)
                x0, x1 = int(rng.randint(0, w)), int(rng.randint(0, w))
                y0, y1 = int(rng.randint(3, h)), int(rng.randint(3, h))
                t = int(rng.randint(2, 4))
                if kind == 0:
                    cv2.line(g, (x0, y0), (x1, y1), 255, t)
                elif kind == 1:
                    cv2.ellipse(
                        g, (w // 2, (y0 + y1) // 2),
                        (max(w // 3, 2), max(abs(y1 - y0) // 2, 2)),
                        0, 0, int(rng.randint(180, 360)), 255, t,
                    )
                else:
                    cv2.line(g, (x0, 3), (x0, y1), 255, t)
        self._cache[token] = g
        return g


def sample_tokens(
    rng: np.random.RandomState,
    charset: tuple[str, ...] = WYLIE_CHARSET,
    n_syllables: tuple[int, int] = (4, 10),
    syllable_len: tuple[int, int] = (1, 4),
) -> list[str]:
    """Random token sequence with "§" separators between syllables."""
    units = [t for t in charset if t != "§"]
    out: list[str] = []
    for s in range(int(rng.randint(*n_syllables))):
        if s:
            out.append("§")
        for _ in range(int(rng.randint(syllable_len[0], syllable_len[1] + 1))):
            out.append(units[int(rng.randint(len(units)))])
    return out


def tokens_to_text(tokens: list[str]) -> str:
    """Ground-truth text in the pipeline's output convention
    ("§" becomes a space, ocr_pipeline.py run_text_recognition)."""
    return "".join(tokens).replace("§", " ").strip()


class MarkovSampler:
    """Token sampler with real n-gram structure (a sparse first-order chain).

    The uniform ``sample_tokens`` distribution gives a character LM nothing
    to model beyond syllable length, so shallow fusion can only add noise
    there (EVAL_r02: beam 0.892% -> beam+LM 1.033%). Real Tibetan has strong
    syllable-internal transition structure the reference's KenLM exploits
    (reference: BDRC/inference.py:97-106). This sampler is the synthetic
    equivalent: each token allows only ``fanout`` successors (fixed per
    seed), so an n-gram LM trained on its output carries genuine information
    the recognizer (trained on UNIFORM text) does not have — the
    distribution-gap eval where fusion must help if implemented correctly.
    """

    def __init__(self, charset: tuple[str, ...] = WYLIE_CHARSET,
                 fanout: int = 4, seed: int = 1234):
        self.charset = charset
        units = [t for t in charset if t != "§"]
        self.units = units
        rng = np.random.RandomState(seed)
        # per-token successor lists + skewed weights (first successor ~50%)
        self.successors = {}
        w = np.array([2.0 ** -i for i in range(fanout)])
        self.weights = w / w.sum()
        for tok in ["<s>"] + units:
            idx = rng.permutation(len(units))[:fanout]
            self.successors[tok] = [units[i] for i in idx]

    def __call__(
        self,
        rng: np.random.RandomState,
        charset: tuple[str, ...] | None = None,
        n_syllables: tuple[int, int] = (4, 10),
        syllable_len: tuple[int, int] = (1, 4),
    ) -> list[str]:
        out: list[str] = []
        prev = "<s>"
        for s in range(int(rng.randint(*n_syllables))):
            if s:
                out.append("§")
            for _ in range(
                int(rng.randint(syllable_len[0], syllable_len[1] + 1))
            ):
                succ = self.successors[prev]
                prev = succ[int(rng.choice(len(succ), p=self.weights))]
                out.append(prev)
        return out


def degrade_page(
    image: np.ndarray, rng: np.random.RandomState, level: float
) -> np.ndarray:
    """Controlled image degradation for the LM-fusion eval: ink dropout
    (holes punched into glyph strokes) plus paper-colored speckle. At
    level ~0.4-0.6 the recognizer (trained on clean strips) starts making
    confusable-glyph errors — exactly the regime where a language model
    should earn its keep. level=0 is the identity."""
    if level <= 0:
        return image
    img = image.copy()
    h, w = img.shape[:2]
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ink = gray < 128
    # dropout: erase random small patches of ink back to paper
    ys, xs = np.nonzero(ink)
    if len(ys):
        n_holes = int(len(ys) * level / 60)
        sel = rng.randint(0, len(ys), size=n_holes)
        r = 2 + int(level * 3)
        paper = np.full(3, 235, np.uint8)
        for i in sel:
            y, x = int(ys[i]), int(xs[i])
            cv2.circle(img, (x, y), int(rng.randint(1, r + 1)),
                       paper.tolist(), -1)
    # speckle: dark dots on paper that survive binarization
    n_specks = int(h * w * level / 4000)
    for _ in range(n_specks):
        y = int(rng.randint(0, h - 2))
        x = int(rng.randint(0, w - 2))
        img[y : y + 2, x : x + 2] = int(rng.randint(20, 70))
    return img


def distort_page(
    image: np.ndarray,
    rng: np.random.RandomState,
    shear_deg: float = 0.0,
    curve_amp: float = 0.0,
) -> np.ndarray:
    """Geometric distortions for the eval suite (round 4): a small
    whole-page rotation (exercises the deskew path — the pipeline rotates
    pages whose line angle exceeds 0.5°, geometry/lines.py
    build_raw_line_data) and a horizontal sine curve (the camera-capture
    warp the TPS gate exists for, dewarp/tps.py check_line_tps). Sign of
    the shear is random per page; paper-colored borders."""
    img = image
    h, w = img.shape[:2]
    paper = (235, 235, 235)
    if curve_amp > 0:
        xs = np.arange(w, dtype=np.float32)
        dy = curve_amp * np.sin(xs * (2.0 * np.pi / (w * 0.9)))
        map_x = np.broadcast_to(xs, (h, w)).astype(np.float32)
        map_y = (
            np.arange(h, dtype=np.float32)[:, None] + dy[None, :]
        ).astype(np.float32)
        img = cv2.remap(
            img, map_x, map_y, cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=paper,
        )
    if shear_deg != 0.0:
        deg = float(shear_deg) * (1 if int(rng.randint(2)) else -1)
        M = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), deg, 1.0)
        img = cv2.warpAffine(
            img, M, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=paper,
        )
    return img


def render_line_strip(
    tokens: list[str],
    glyphs: GlyphSet,
    rng: np.random.RandomState,
    gap: tuple[int, int] = (2, 7),
) -> np.ndarray:
    """One text line as an RGB strip: light noisy paper, dark ink."""
    h = glyphs.height
    parts: list[np.ndarray] = []
    for tok in tokens:
        g = glyphs.glyph(tok)
        parts.append(g)
        gw = int(rng.randint(*gap))
        parts.append(np.zeros((h, gw), np.uint8))
    ink = np.concatenate(parts[:-1] if len(parts) > 1 else parts, axis=1)
    w = ink.shape[1]
    strip = rng.randint(215, 250, (h, w, 3)).astype(np.uint8)
    dark = rng.randint(15, 70, (h, w, 3)).astype(np.uint8)
    sel = ink > 0
    strip[sel] = dark[sel]
    return strip


@dataclass
class SyntheticPage:
    image: np.ndarray           # (H, W, 3) uint8
    line_mask: np.ndarray       # (H, W) uint8 {0, 255}
    texts: list[str]            # per line, reading order, pipeline convention
    token_lines: list[list[str]]


def render_page(
    rng: np.random.RandomState,
    glyphs: GlyphSet,
    charset: tuple[str, ...] = WYLIE_CHARSET,
    n_lines: tuple[int, int] = (4, 7),
    page_w: int = 1024,
    margin: int = 48,
    gap: tuple[int, int] = (50, 90),
    n_syllables: tuple[int, int] = (4, 10),
    syllable_len: tuple[int, int] = (1, 4),
    align: str = "random",
    token_sampler=None,
) -> SyntheticPage:
    """A pecha-like page: stacked text lines, light paper, dark ink, plus
    the exact line mask (the segmentation ground truth) and transcripts.

    The GT mask is one SOLID rectangle per line (the blob semantics the
    reference's line models emit — one component per text line), and the
    line pitch leaves room for the pipeline's dilated strip extraction
    (strip height <= bbox_h * bbox_tolerance, geometry/lines.py) without
    swallowing neighbours — the proportions of a real pecha."""
    h_line = glyphs.height
    n = int(rng.randint(*n_lines))
    pitch = h_line + int(rng.randint(*gap))
    page_h = 2 * margin + n * pitch
    page = rng.randint(215, 250, (page_h, page_w, 3)).astype(np.uint8)
    mask = np.zeros((page_h, page_w), np.uint8)
    texts: list[str] = []
    token_lines: list[list[str]] = []

    sampler = token_sampler or sample_tokens
    max_w = page_w - 2 * margin
    for i in range(n):
        tokens = sampler(rng, charset, n_syllables, syllable_len)
        strip_rgb = render_line_strip(tokens, glyphs, rng)
        # trim token list until the strip fits the text area
        while strip_rgb.shape[1] > max_w and len(tokens) > 2:
            tokens = tokens[: max(len(tokens) - 3, 2)]
            if tokens and tokens[-1] == "§":
                tokens = tokens[:-1]
            strip_rgb = render_line_strip(tokens, glyphs, rng)
        y0 = margin + i * pitch + int(rng.randint(-3, 4))
        if align == "left":
            # pecha-style: lines share the left margin (the layout the
            # reference's slice-voting reading-order sort assumes —
            # line_detection.py:362-424 votes in the vertical slice with
            # the most contours, degenerate when short lines scatter)
            x0 = margin + int(rng.randint(0, 9))
        else:
            x0 = margin + int(
                rng.randint(0, max(max_w - strip_rgb.shape[1], 1))
            )
        sh, sw = strip_rgb.shape[:2]
        page[y0 : y0 + sh, x0 : x0 + sw] = strip_rgb
        mask[y0 : y0 + sh, x0 : x0 + sw] = 255
        texts.append(tokens_to_text(tokens))
        token_lines.append(tokens)

    return SyntheticPage(page, mask, texts, token_lines)


def extraction_matched_strip(
    rng: np.random.RandomState,
    glyphs: GlyphSet,
    charset: tuple[str, ...] = WYLIE_CHARSET,
    k_factor: float = 2.5,
    bbox_tolerance: float = 4.0,
    gap: tuple[int, int] = (50, 90),
    tokens: list[str] | None = None,
    n_syllables: tuple[int, int] = (4, 10),
    syllable_len: tuple[int, int] = (1, 4),
    shear_deg: float = 0.0,
    curve_amp: float = 0.0,
) -> tuple[np.ndarray, list[str]]:
    """One recognizer training sample produced by the REAL strip-extraction
    path: the target line rendered in page context (neighbour lines above
    and below at page pitch) and cropped through geometry.get_line_image
    with the pipeline's defaults (run_ocr k_factor/bbox_tolerance,
    ocr_pipeline.py). Training inputs therefore carry exactly the eval-time
    artefacts — dilation-scaled strip heights, surrounding paper, partial
    neighbour ink, page-edge black — closing the train/eval distribution
    gap that pure isolated strips leave open."""
    from ocr_inference_tpu.geometry.lines import get_line_image

    if tokens is None:
        tokens = sample_tokens(rng, charset, n_syllables, syllable_len)
    strip = render_line_strip(tokens, glyphs, rng)
    h_line = glyphs.height
    pitch = h_line + int(rng.randint(*gap))
    # render_page's page margin: page-edge proximity must match eval pages —
    # the adaptive-k ROI of a page-top line clips at y=0 and its strip
    # carries the full top margin instead of a neighbour line. Training
    # only the interior geometry left first/last lines out of distribution
    # (measured: CER 0.00 on interior lines, ~0.75 on every page-top line).
    margin = 48
    sh, sw = strip.shape[:2]
    canvas_w = sw + 2 * margin
    canvas_h = 2 * margin + 3 * pitch
    canvas = rng.randint(215, 250, (canvas_h, canvas_w, 3)).astype(np.uint8)
    # target slot 0 = page top (no line above), 1 = interior, 2 = page
    # bottom (no line below) — drawn with the page-line frequency of
    # boundary rows (a 4-7-line page is ~2/5 boundary lines)
    target = (0, 1, 1, 1, 2)[int(rng.randint(5))]
    rows = {0: (0, 1), 1: (0, 1, 2), 2: (1, 2)}[target]
    y_t = x_t = 0
    for row in rows:
        y0 = margin + row * pitch + int(rng.randint(-3, 4))
        if row == target:
            s = strip
            x0 = margin
            y_t, x_t = y0, x0
        else:
            s = render_line_strip(
                sample_tokens(rng, charset, n_syllables, syllable_len),
                glyphs, rng,
            )
            s = s[:, : canvas_w - margin]
            x0 = int(rng.randint(0, max(canvas_w - margin - s.shape[1], 1)))
        canvas[y0 : y0 + s.shape[0], x0 : x0 + s.shape[1]] = s
    if target == 0:
        canvas = canvas[: 2 * margin + 2 * pitch]
    elif target == 2:
        canvas = canvas[pitch:]
        y_t -= pitch
    if shear_deg > 0 or curve_amp > 0:
        # distort the page-context canvas BEFORE extraction — exactly where
        # eval-page distortion happens. Post-extraction strip distortion is
        # WRONG twice over: it clips ink off the tight strip, and it misses
        # the real effect of curvature on the pipeline (taller dilated
        # strips -> stronger downscale in pad_ocr_line -> smaller glyphs,
        # neighbor ink entering the dilated mask), which is what the
        # recognizer actually faces (round-4 curve-page strips measured
        # ~220 px tall vs ~120 flat).
        canvas = distort_page(canvas, rng, shear_deg=shear_deg,
                              curve_amp=curve_amp)
    # the contour must cover the DISPLACED ink, as a detection contour
    # would: curvature moves ink by up to +/-amp and shear by up to
    # w*sin(deg), so the detected bbox of a curved line is taller — and the
    # k*bbox_h dilation then produces proportionally taller strips (the
    # eval-time scale distribution the recognizer must match; round-4
    # measured ~220 px curve-page strips vs ~150 flat)
    grow = int(np.ceil(curve_amp + sw * np.sin(np.radians(shear_deg)) / 2))
    y0 = max(y_t - grow, 0)
    y1 = min(y_t + sh - 1 + grow, canvas.shape[0] - 1)
    contour = np.array(
        [[[x_t, y0]], [[x_t + sw - 1, y0]],
         [[x_t + sw - 1, y1]], [[x_t, y1]]],
        dtype=np.int32,
    )
    img, _ = get_line_image(
        canvas, contour, y1 - y0 + 1,
        bbox_tolerance=bbox_tolerance, k_factor=k_factor,
    )
    return img, tokens


# ---------------------------------------------------------------------------
# Training batches (exactly the representations the engines feed the models)
# ---------------------------------------------------------------------------

def recognizer_batch(
    rng: np.random.RandomState,
    glyphs: GlyphSet,
    charset: tuple[str, ...],
    batch: int,
    input_height: int = 80,
    width: int = 512,
    max_label: int = 48,
    n_syllables: tuple[int, int] = (4, 10),
    syllable_len: tuple[int, int] = (1, 4),
    degrade_max: float = 0.0,
    shear_max_deg: float = 0.0,
    curve_max_amp: float = 0.0,
    geo_prob: float = 1.0,
) -> dict:
    """CTC training batch in the RecognitionEngine's exact input
    representation: strips -> pad_ocr_line canvas -> grayscale -> cv2
    adaptive threshold -> {-1, +1} (pipeline/engines.py _prepare_host +
    _forward_fn). ``degrade_max`` > 0 applies ink-dropout/speckle
    augmentation at a per-sample level ~ U(0, degrade_max), matching the
    eval suite's degraded distributions. ``shear_max_deg``/``curve_max_amp``
    add per-sample geometric augmentation (rotation ~ U(0, max) with random
    sign, vertical sine ~ U(0, max) px): pages rotated within the pipeline's
    0.5° deskew threshold and curved below the TPS gate reach the
    recognizer undistorted-by-correction, so the net itself must absorb
    them (round-4 eval: an unaugmented recognizer scored CER ~0.5-0.7 on
    exactly-threshold shear/curve pages while clean pages scored 0.0).

    ``geo_prob`` < 1 makes the geometric augmentation a per-sample coin
    flip: with probability 1-geo_prob the sample keeps FLAT page-context
    geometry (degrade still applies). U(0, max) geometric draws leave
    almost no geometrically-clean samples in a batch, and the round-4
    generalist fine-tuned that way lost 6x on clean pages (EVAL_r04: 4.26%
    vs the flat specialist's 0.56%) while also regressing on degrade-only
    pages — distribution-balanced sampling is the round-5 fix (VERDICT r4
    item 2)."""
    from ocr_inference_tpu.core.config import BINARIZE_BLOCK, BINARIZE_C
    from ocr_inference_tpu.pipeline.engines import pad_ocr_line_host

    images = np.zeros((batch, input_height, width), np.float32)
    labels = np.zeros((batch, max_label), np.int32)
    label_lengths = np.zeros((batch,), np.int32)
    for b in range(batch):
        geo = geo_prob >= 1.0 or float(rng.uniform()) < geo_prob
        sd = (
            float(rng.uniform(0.0, shear_max_deg))
            if (shear_max_deg and geo) else 0.0
        )
        ca = (
            float(rng.uniform(0.0, curve_max_amp))
            if (curve_max_amp and geo) else 0.0
        )
        strip, tokens = extraction_matched_strip(
            rng, glyphs, charset,
            n_syllables=n_syllables, syllable_len=syllable_len,
            shear_deg=sd, curve_amp=ca,
        )
        if len(tokens) > max_label:
            tokens = tokens[: max_label - 1]
            strip, _ = extraction_matched_strip(
                rng, glyphs, charset, tokens=tokens,
                shear_deg=sd, curve_amp=ca,
            )
        # keep the scaled width within the canvas
        scale = input_height / strip.shape[0]
        while strip.shape[1] * scale > width and len(tokens) > 2:
            tokens = tokens[: max(len(tokens) - 2, 2)]
            strip, _ = extraction_matched_strip(
                rng, glyphs, charset, tokens=tokens,
                shear_deg=sd, curve_amp=ca,
            )
            scale = input_height / strip.shape[0]
        if degrade_max > 0:
            strip = degrade_page(
                strip, rng, float(rng.uniform(0.0, degrade_max))
            )
        canvas = pad_ocr_line_host(strip, width, input_height)
        gray = cv2.cvtColor(canvas, cv2.COLOR_RGB2GRAY)
        bw = cv2.adaptiveThreshold(
            gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY,
            BINARIZE_BLOCK, BINARIZE_C,
        )
        images[b] = (bw > 0).astype(np.float32) * 2.0 - 1.0
        ids = [charset.index(t) + 1 for t in tokens]
        labels[b, : len(ids)] = ids
        label_lengths[b] = len(ids)
    return {
        "images": images,
        "image_widths": np.full((batch,), width, np.int32),
        "labels": labels,
        "label_lengths": label_lengths,
    }


def segmentation_batch(
    rng: np.random.RandomState,
    glyphs: GlyphSet,
    charset: tuple[str, ...],
    batch: int,
    patch: int = 512,
) -> dict:
    """Tile training batch in the SegmentationEngine's exact input
    representation: binarized tiles in {0, 1}, 3 channels (engines.py
    _pre_fn), with the synthetic line mask as target."""
    from ocr_inference_tpu.core.config import BINARIZE_BLOCK, BINARIZE_C

    images = np.zeros((batch, patch, patch, 3), np.float32)
    targets = np.zeros((batch, patch, patch, 1), np.float32)
    b = 0
    while b < batch:
        pg = render_page(rng, glyphs, charset, page_w=patch * 2)
        padded_h = -(-pg.image.shape[0] // patch) * patch
        img = np.full((padded_h, patch * 2, 3), 255, np.uint8)
        img[: pg.image.shape[0]] = pg.image
        msk = np.zeros((padded_h, patch * 2), np.uint8)
        msk[: pg.line_mask.shape[0]] = pg.line_mask
        for ty in range(padded_h // patch):
            for tx in range(2):
                if b >= batch:
                    break
                tile = img[ty * patch : (ty + 1) * patch,
                           tx * patch : (tx + 1) * patch]
                gray = cv2.cvtColor(tile, cv2.COLOR_RGB2GRAY)
                bw = cv2.adaptiveThreshold(
                    gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                    cv2.THRESH_BINARY, BINARIZE_BLOCK, BINARIZE_C,
                )
                images[b] = np.repeat(
                    (bw > 0).astype(np.float32)[..., None], 3, axis=-1
                )
                targets[b, ..., 0] = (
                    msk[ty * patch : (ty + 1) * patch,
                        tx * patch : (tx + 1) * patch] > 0
                ).astype(np.float32)
                b += 1
    return {"images": images, "targets": targets}
