"""Native libjpeg/libpng codec: build, decode parity with cv2/PIL, and
byte-level JPEG round-trip parity with tf.image.adjust_jpeg_quality."""

import numpy as np
import pytest

from denoise_gan_tpu.data import native


@pytest.fixture(scope="module")
def codec():
    if not native.available():
        pytest.skip("native codec unavailable (no g++/libjpeg/libpng)")
    return native


def _smooth(rng, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.5 + 0.3 * np.sin(xx / 9) * np.cos(yy / 7)
    img = np.stack([img, np.roll(img, 2, 0), np.roll(img, 4, 1)], -1)
    img += 0.05 * rng.random((h, w, 3)).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def test_png_decode_matches_cv2(tmp_path, rng, codec):
    cv2 = pytest.importorskip("cv2")
    img = _smooth(rng)
    path = str(tmp_path / "a.png")
    cv2.imwrite(path, img[..., ::-1])
    got = codec.decode(path)
    want = cv2.imread(path)[..., ::-1]
    np.testing.assert_array_equal(got, want)


def test_jpeg_decode_matches_cv2(tmp_path, rng, codec):
    cv2 = pytest.importorskip("cv2")
    img = _smooth(rng)
    path = str(tmp_path / "a.jpg")
    cv2.imwrite(path, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
    got = codec.decode(path)
    want = cv2.imread(path)[..., ::-1]
    assert got.shape == want.shape
    # different libjpeg IDCT paths can differ by a couple of levels
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 4


def test_jpeg_roundtrip_matches_tf(rng, codec):
    tf = pytest.importorskip("tensorflow")
    img = _smooth(rng, 64, 64)
    got = codec.jpeg_roundtrip_u8(img, 50)
    want = tf.image.adjust_jpeg_quality(
        tf.constant(img.astype(np.float32) / 255.0), 50).numpy()
    want_u8 = np.round(want * 255).astype(np.uint8)
    assert got is not None
    assert np.abs(got.astype(int) - want_u8.astype(int)).max() <= 4


def test_decode_rejects_garbage(tmp_path, codec):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xffnot a real jpeg")
    assert codec.decode(str(p)) is None
