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
