"""Synthetic-script renderer: determinism, geometry, batch conventions."""

import numpy as np

from ocr_inference_tpu.eval.synthetic import (
    WYLIE_CHARSET,
    GlyphSet,
    recognizer_batch,
    render_line_strip,
    render_page,
    sample_tokens,
    segmentation_batch,
    tokens_to_text,
)


def test_glyphs_deterministic_and_distinct():
    g1, g2 = GlyphSet(height=40, seed=7), GlyphSet(height=40, seed=7)
    for tok in WYLIE_CHARSET:
        assert (g1.glyph(tok) == g2.glyph(tok)).all()
        assert g1.glyph(tok).any()
    # different seeds give a different script
    g3 = GlyphSet(height=40, seed=8)
    diff = sum(
        g1.glyph(t).shape != g3.glyph(t).shape
        or not (g1.glyph(t) == g3.glyph(t)).all()
        for t in WYLIE_CHARSET
    )
    assert diff > len(WYLIE_CHARSET) // 2


def test_render_page_mask_covers_ink():
    rng = np.random.RandomState(0)
    glyphs = GlyphSet(height=40)
    page = render_page(rng, glyphs)
    assert page.image.ndim == 3 and page.line_mask.ndim == 2
    assert len(page.texts) == len(page.token_lines) >= 4
    ink = page.image[..., 0] < 120
    assert (page.line_mask[ink] > 0).mean() > 0.99  # mask covers the ink
    # one mask component band per line (roughly)
    import cv2

    n, _ = cv2.connectedComponents((page.line_mask > 0).astype(np.uint8))
    assert n - 1 >= len(page.texts)


def test_tokens_to_text_convention():
    assert tokens_to_text(["k", "a", "§", "m", "i"]) == "ka mi"


def test_recognizer_batch_shapes_and_values():
    rng = np.random.RandomState(1)
    glyphs = GlyphSet(height=40)
    b = recognizer_batch(rng, glyphs, WYLIE_CHARSET, 3, width=256)
    assert b["images"].shape == (3, 80, 256)
    assert set(np.unique(b["images"])) <= {-1.0, 1.0}
    assert (b["label_lengths"] > 0).all()
    assert b["labels"].max() <= len(WYLIE_CHARSET)
    assert b["labels"].min() >= 0


def test_segmentation_batch_shapes_and_values():
    rng = np.random.RandomState(2)
    glyphs = GlyphSet(height=40)
    b = segmentation_batch(rng, glyphs, WYLIE_CHARSET, 2, patch=256)
    assert b["images"].shape == (2, 256, 256, 3)
    assert b["targets"].shape == (2, 256, 256, 1)
    assert set(np.unique(b["images"])) <= {0.0, 1.0}
    assert 0 < b["targets"].mean() < 0.9


def test_sample_tokens_structure():
    rng = np.random.RandomState(3)
    toks = sample_tokens(rng)
    assert toks and toks[0] != "§" and toks[-1] != "§"
    assert all(t in WYLIE_CHARSET for t in toks)


def test_full_charset_77_unique_glyphs():
    from ocr_inference_tpu.eval.synthetic import (
        WYLIE_CHARSET_FULL, GlyphSet,
    )

    assert len(WYLIE_CHARSET_FULL) == 77
    assert len(set(WYLIE_CHARSET_FULL)) == 77
    glyphs = GlyphSet(charset=WYLIE_CHARSET_FULL, height=40, seed=7)
    # every token renders a non-empty ink mask of the configured height
    for tok in WYLIE_CHARSET_FULL:
        g = glyphs.glyph(tok)
        assert g.shape[0] == 40 and g.max() == 255


def test_distort_page_shear_and_curve():
    import numpy as np

    from ocr_inference_tpu.eval.synthetic import distort_page

    rng = np.random.RandomState(3)
    img = np.full((200, 400, 3), 235, np.uint8)
    img[90:110, 50:350] = 40
    sheared = distort_page(img, rng, shear_deg=1.0)
    assert sheared.shape == img.shape
    # rotation moved ink off the original band
    assert (sheared[90:110, 50:350] == 40).mean() < 0.99
    curved = distort_page(img, np.random.RandomState(3), curve_amp=8.0)
    assert curved.shape == img.shape
    # curvature displaces the band vertically at some x, not others
    cols_with_ink = [
        int(np.nonzero(curved[:, x, 0] < 128)[0].mean())
        for x in (60, 200, 340)
    ]
    assert max(cols_with_ink) - min(cols_with_ink) >= 4
    # level 0 / no-op args are the identity
    np.testing.assert_array_equal(distort_page(img, rng), img)


def test_recognizer_batch_degrade_augmentation():
    import numpy as np

    from ocr_inference_tpu.eval.synthetic import (
        WYLIE_CHARSET, GlyphSet, recognizer_batch,
    )

    glyphs = GlyphSet(height=40, seed=7)
    clean = recognizer_batch(
        np.random.RandomState(5), glyphs, WYLIE_CHARSET, 2, width=256
    )
    noisy = recognizer_batch(
        np.random.RandomState(5), glyphs, WYLIE_CHARSET, 2, width=256,
        degrade_max=0.8,
    )
    assert clean["images"].shape == noisy["images"].shape
    assert not np.array_equal(clean["images"], noisy["images"])
