"""Image kernel parity tests against the cv2/NumPy reference semantics."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_inference_tpu.ops import imaging, tiling


def _page(rng, h=300, w=420):
    """Synthetic manuscript-ish page: light background, dark line bands."""
    img = np.full((h, w, 3), 235, dtype=np.uint8)
    noise = rng.integers(-15, 15, size=(h, w, 3))
    img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
    for y0 in range(40, h - 20, 60):
        img[y0 : y0 + 18, 30 : w - 30] = rng.integers(20, 80, size=(18, w - 60, 3))
    return img


def test_rgb_to_gray_matches_cv2(rng):
    img = rng.integers(0, 256, size=(64, 96, 3), dtype=np.uint8)
    ours = np.asarray(imaging.rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    assert np.array_equal(ours, ref)


def test_gaussian_kernel_matches_cv2():
    ours = imaging.gaussian_kernel_1d(51, 0.0)
    ref = cv2.getGaussianKernel(51, 0).ravel().astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_adaptive_binarize_matches_cv2(rng):
    img = _page(rng)
    ours = np.asarray(imaging.binarize(jnp.asarray(img)))
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ref_bw = cv2.adaptiveThreshold(
        gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY, 51, 13
    )
    ref = cv2.cvtColor(ref_bw, cv2.COLOR_GRAY2RGB)
    assert ours.shape == ref.shape
    mismatch = np.mean(ours[..., 0] != ref[..., 0])
    # only pixels whose gray value sits exactly on the rounded threshold
    # boundary may flip; on noisy pages that is a tiny fraction
    assert mismatch < 0.005, f"binarize mismatch fraction {mismatch}"


def test_global_binarize_matches_cv2(rng):
    img = _page(rng)
    ours = np.asarray(imaging.binarize(jnp.asarray(img), adaptive=False))
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    _, ref_bw = cv2.threshold(gray, 120, 255, cv2.THRESH_BINARY)
    assert np.array_equal(ours[..., 0], ref_bw)


@pytest.mark.parametrize(
    "src,dst",
    [((100, 160), (50, 80)), ((100, 160), (217, 333)), ((64, 64), (512, 512))],
)
def test_resize_bilinear_matches_cv2(rng, src, dst):
    img = rng.integers(0, 256, size=(*src, 3), dtype=np.uint8)
    ours = np.asarray(imaging.resize_bilinear(jnp.asarray(img), dst[0], dst[1]))
    ref = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # cv2 uses 5-bit fixed-point interpolation weights -> off-by-one allowed
    assert np.mean(diff > 1) < 0.01
    assert diff.max() <= 3


def test_rotate_matches_cv2(rng):
    img = _page(rng, 200, 300)
    angle = 3.7
    ours = np.asarray(imaging.rotate_from_angle(jnp.asarray(img), angle))
    rows, cols = img.shape[:2]
    m = cv2.getRotationMatrix2D((cols / 2, rows / 2), angle, 1)
    ref = cv2.warpAffine(img, m, (cols, rows), borderValue=(0, 0, 0))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff > 2) < 0.02
    # gross structure must match: same nonzero support up to a thin boundary
    assert np.mean((ours.sum(-1) > 0) != (ref.sum(-1) > 0)) < 0.01


def test_dilate_matches_cv2(rng):
    mask = (rng.random((80, 120)) > 0.93).astype(np.uint8) * 255
    for kh, kw in [(3, 3), (12, 2), (17, 20)]:
        kernel = np.ones((kh, kw), dtype=np.uint8)
        ref = cv2.dilate(mask, kernel=kernel, iterations=1)
        ours = np.asarray(imaging.dilate_rect(jnp.asarray(mask), kh, kw))
        assert np.array_equal(ours, ref), (kh, kw)


def test_erode_matches_cv2(rng):
    mask = (rng.random((60, 90)) > 0.4).astype(np.uint8) * 255
    ref = cv2.erode(mask, kernel=np.ones((5, 3), np.uint8), iterations=1)
    ours = np.asarray(imaging.erode_rect(jnp.asarray(mask), 5, 3))
    # cv2 erode pads with +inf (replicate max); ours matches in the interior
    assert np.array_equal(ours[3:-3, 2:-2], ref[3:-3, 2:-2])


def test_remap_matches_scipy(rng):
    from scipy import ndimage

    img = rng.integers(0, 256, size=(50, 70), dtype=np.uint8)
    ys = rng.random((40, 60)) * 55 - 3
    xs = rng.random((40, 60)) * 75 - 3
    ours = np.asarray(
        imaging.remap(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs))
    )
    ref = ndimage.map_coordinates(img, np.stack([ys, xs]), order=1, mode="constant")
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int)) > 1) < 0.01


def test_tile_stitch_roundtrip_and_order(rng):
    img = rng.integers(0, 256, size=(1024, 1536, 3), dtype=np.uint8)
    tiles = tiling.tile_page(jnp.asarray(img), 512)
    assert tiles.shape == (6, 512, 512, 3)
    # row-major: tile 1 is the second tile of the first row (ref utils.py:713)
    np.testing.assert_array_equal(np.asarray(tiles[1]), img[0:512, 512:1024])
    np.testing.assert_array_equal(np.asarray(tiles[3]), img[512:1024, 0:512])
    back = tiling.stitch_tiles(tiles, y_steps=2)
    np.testing.assert_array_equal(np.asarray(back), img)
    # single-channel stitch (predictions path)
    pred = tiles[..., 0]
    back1 = tiling.stitch_tiles(pred, y_steps=2)
    np.testing.assert_array_equal(np.asarray(back1), img[..., 0])


def test_plan_page_clamps_match_reference_rules():
    # wide page over clamp
    p = tiling.plan_page(2000, 6000)
    assert p.resized_w == 4096 and p.resized_h == int(2000 * 4096 / 6000)
    # tall page over clamp
    p = tiling.plan_page(4000, 1000)
    assert p.resized_h == 2048 and p.resized_w == int(1000 * 2048 / 4000)
    # short page upscaled to patch height
    p = tiling.plan_page(300, 1000)
    assert p.resized_h == 512
    # padding to multiple of 512
    assert p.padded_h % 512 == 0 and p.padded_w % 512 == 0
    assert p.padded_h >= p.resized_h and p.padded_w >= p.resized_w


def test_preprocess_page_pads_with_white(rng):
    img = rng.integers(0, 200, size=(700, 900, 3), dtype=np.uint8)
    plan = tiling.plan_page(700, 900)
    out = np.asarray(tiling.preprocess_page(jnp.asarray(img), plan))
    assert out.shape == (plan.padded_h, plan.padded_w, 3)
    assert (out[700:, :, :] == 255).all()
    assert (out[:, 900:, :] == 255).all()
    np.testing.assert_array_equal(out[:700, :900], img)


def test_pad_ocr_line_matches_reference_geometry(rng):
    import sys

    # reference-equivalent host implementation for comparison
    def ref_pad(img, tw, th, padding="black"):
        wr, hr = tw / img.shape[1], th / img.shape[0]
        if wr < hr or wr == hr:
            scale = tw / img.shape[1]
            tmp = cv2.resize(img, (tw, int(img.shape[0] * scale)))
            middle = (th - tmp.shape[0]) // 2
            v = 255 if padding == "white" else 0
            up = np.full((middle, tw, 3), v, np.uint8)
            lo = np.full((th - tmp.shape[0] - middle, tw, 3), v, np.uint8)
            out = np.vstack([up, tmp, lo])
        else:
            scale = th / img.shape[0]
            tmp = cv2.resize(img, (int(img.shape[1] * scale), th))
            middle = (tw - tmp.shape[1]) // 2
            v = 255 if padding == "white" else 0
            le = np.full((th, middle, 3), v, np.uint8)
            ri = np.full((th, tw - tmp.shape[1] - middle, 3), v, np.uint8)
            out = np.hstack([le, tmp, ri])
        return cv2.resize(out, (tw, th), interpolation=cv2.INTER_LINEAR)

    for h, w in [(60, 2400), (120, 900), (80, 3000)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ours = np.asarray(tiling.pad_ocr_line(jnp.asarray(img), 3000, 80))
        ref = ref_pad(img, 3000, 80)
        assert ours.shape == ref.shape == (80, 3000, 3)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff > 2) < 0.02, (h, w, np.mean(diff > 2))


def test_pre_pad_line():
    img = np.zeros((40, 100, 3), dtype=np.uint8)
    out = tiling.pre_pad_line(img)
    assert out.shape == (40, 180, 3)
    assert (out[:, :40] == 255).all() and (out[:, -40:] == 255).all()


def test_bucket_for_width():
    buckets = (512, 1024, 2000, 3000)
    assert tiling.bucket_for_width(400, 80, 80, buckets) == 512
    assert tiling.bucket_for_width(1500, 80, 80, buckets) == 2000
    assert tiling.bucket_for_width(9000, 80, 80, buckets) == 3000
    # a tall strip scaled down to 80 high shrinks in width
    assert tiling.bucket_for_width(800, 160, 80, buckets) == 512


def test_ops_are_jittable(rng):
    img = jnp.asarray(rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8))
    jitted = jax.jit(imaging.binarize)
    out = jitted(img)
    assert out.shape == (256, 256, 3)
    jr = jax.jit(lambda x: imaging.resize_bilinear(x, 128, 128))
    assert jr(img).shape == (128, 128, 3)


def test_pallas_binarize_kernel_semantics(rng):
    """Fused Pallas binarize (interpret mode) is bit-exact vs the XLA path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ocr_inference_tpu.ops.imaging import binarize, rgb_to_gray
    from ocr_inference_tpu.ops.pallas_kernels import _band_matrix, _binarize_kernel

    tile = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    gray = np.asarray(rgb_to_gray(jnp.asarray(tile))).astype(np.float32)
    lmat = _band_matrix(256, 51)
    rmat = _band_matrix(256, 51).T
    out = pl.pallas_call(
        _binarize_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        interpret=True,
    )(jnp.asarray(gray), jnp.asarray(lmat), jnp.asarray(rmat))
    ref = np.asarray(binarize(jnp.asarray(tile)))[..., 0]
    assert (np.asarray(out).astype(np.uint8) == ref).all()


def test_pack_unpack_mask_roundtrip(rng):
    import jax.numpy as jnp

    from ocr_inference_tpu.ops.packing import pack_mask, unpack_mask

    for shape in [(64, 100), (3, 50, 257), (128, 2640)]:
        mask = (rng.random(shape) > 0.5).astype(np.uint8)
        packed = np.asarray(pack_mask(jnp.asarray(mask)))
        assert packed.dtype == np.int32
        back = unpack_mask(packed, shape[-1])
        np.testing.assert_array_equal(back, mask)
