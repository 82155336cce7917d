"""On-device JPEG round-trip vs the TF/libjpeg oracle, plus metric tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.ops import jpeg_roundtrip, psnr, ssim
from denoise_gan_tpu.ops.jpeg import quality_to_tables, random_jpeg_quality

tf = pytest.importorskip("tensorflow")


def _test_image(rng, h=64, w=64):
    # smooth image + structured edges; pure noise is unrepresentative of JPEG
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.35 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
    img = np.stack([base, np.roll(base, 3, 0), np.roll(base, 5, 1)], -1)
    img += 0.1 * rng.random((h, w, 3)).astype(np.float32)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def test_quality_tables_match_libjpeg_scaling():
    # spot-check against libjpeg's formula for q=50 (scale=100 -> base tables)
    luma, chroma = quality_to_tables(50)
    assert float(luma[0, 0]) == 16.0 and float(chroma[0, 0]) == 17.0
    luma10, _ = quality_to_tables(10)
    assert float(luma10[0, 0]) == 80.0  # 16*500/100


@pytest.mark.parametrize("quality", [25, 50, 75])
def test_jpeg_roundtrip_close_to_tf(rng, quality):
    img = _test_image(rng)
    ours = np.asarray(jpeg_roundtrip(jnp.asarray(img), quality))
    ref = tf.image.adjust_jpeg_quality(tf.constant(img), quality).numpy()
    # Same artifact structure: the two degraded images must be much closer to
    # each other than the degradation they apply.
    err_ours_ref = float(np.abs(ours - ref).mean())
    err_applied = float(np.abs(ref - img).mean())
    assert err_ours_ref < 0.6 * err_applied, (err_ours_ref, err_applied)
    # and pixelwise close in absolute terms
    assert err_ours_ref < 0.02


def test_jpeg_quality_ordering(rng):
    img = _test_image(rng)
    e = {}
    for q in (10, 50, 95):
        out = np.asarray(jpeg_roundtrip(jnp.asarray(img), q))
        e[q] = float(np.abs(out - img).mean())
    assert e[10] > e[50] > e[95] > 0


def test_jpeg_batched_and_odd_sizes(rng):
    img = np.clip(rng.random((2, 37, 53, 3)), 0, 1).astype(np.float32)
    out = np.asarray(jpeg_roundtrip(jnp.asarray(img), 50))
    assert out.shape == img.shape
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_random_jpeg_quality_batch(rng):
    img = np.clip(rng.random((4, 32, 32, 3)), 0, 1).astype(np.float32)
    out = np.asarray(random_jpeg_quality(jnp.asarray(img), jax.random.key(0)))
    assert out.shape == img.shape
    # different images got different qualities -> different error levels
    errs = np.abs(out - img).mean(axis=(1, 2, 3))
    assert len(np.unique(errs.round(5))) > 1


def test_psnr_matches_tf(rng):
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = rng.random((2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    want = tf.image.psnr(tf.constant(a), tf.constant(b), max_val=1.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_matches_tf(rng):
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    got = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    want = tf.image.ssim(tf.constant(a), tf.constant(b), max_val=1.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
