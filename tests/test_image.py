"""Image decode + grayscale tests (reference core/grayscale_test.go,
core/image_test.go)."""

import numpy as np

from pigo_tpu.io.image import decode_image, get_image, rgb_to_grayscale


def scalar_reference_gray(img):
    """Direct transliteration of RgbToGrayscale (core/grayscale.go:8-23)."""
    h, w = img.shape[0], img.shape[1]
    out = np.zeros(h * w, np.uint8)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) * 257 for v in img[y, x, :3])
            out[y * w + x] = np.uint8(
                int((0.299 * r + 0.587 * g + 0.114 * b) / 256)
            )
    return out


def test_grayscale_matches_scalar_reference(sample_image):
    crop = sample_image[:16, :16]
    fast = rgb_to_grayscale(crop)
    assert np.array_equal(fast, scalar_reference_gray(crop))


def test_grayscale_length_invariant(sample_image):
    """len(gray) == len(NRGBA.Pix) / 4 (core/pigo_test.go:60-66)."""
    gray = rgb_to_grayscale(sample_image)
    assert gray.size == sample_image.size // 4


def test_decode_shapes(sample_image):
    assert sample_image.shape == (400, 320, 4)
    assert sample_image.dtype == np.uint8
    png = get_image("assets/testdata/test.png")
    assert png.shape[2] == 4


def test_decode_bytes_roundtrip():
    raw = open("assets/testdata/sample.jpg", "rb").read()
    img = decode_image(raw)
    assert img.shape == (400, 320, 4)


def test_grayscale_premultiplied_alpha():
    img = np.zeros((2, 2, 4), np.uint8)
    img[..., 0] = 200  # red
    img[..., 3] = 128  # half alpha
    gray = rgb_to_grayscale(img)
    # Go: r16 = 200*257*128//255 = 25800*... -> luma = 0.299*r16/256
    r16 = 200 * 257 * 128 // 255
    expected = np.uint8(int(0.299 * r16 / 256))
    assert np.all(gray == expected)


def test_grayscale_2d_passthrough():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(rgb_to_grayscale(g), g.ravel())


def test_grayscale_low_channel_counts():
    """(H, W, 1) and (H, W, 2) inputs must not read past the channel axis
    (the NRGBA expansion has r=g=b, so luma == the gray value)."""
    rng = np.random.default_rng(0)
    g1 = rng.integers(0, 256, (5, 7, 1), dtype=np.uint8)
    assert np.array_equal(rgb_to_grayscale(g1), g1[..., 0].ravel())
    g2 = np.concatenate(
        [g1, np.full((5, 7, 1), 255, np.uint8)], axis=-1
    )  # opaque gray+alpha
    assert np.array_equal(rgb_to_grayscale(g2), g1[..., 0].ravel())
    g2a = g2.copy()
    g2a[..., 1] = 128  # premultiplied: v*257*128//255, /256 truncated
    want = (
        (g1[..., 0].astype(np.int64) * 257 * 128 // 255).astype(np.float64)
        / 256.0
    ).astype(np.uint8).ravel()
    assert np.array_equal(rgb_to_grayscale(g2a), want)


def test_native_grayscale_low_channel_counts():
    from pigo_tpu import native as nat

    if not nat.native_available():
        import pytest

        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(1)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (6, 5, ch), dtype=np.uint8)
        got = nat.native_grayscale(img)
        assert np.array_equal(got, rgb_to_grayscale(img)), f"channels={ch}"
