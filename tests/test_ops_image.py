"""Unit tests for denoise_gan_tpu.ops.image against TF oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.ops import (
    depth_to_space, space_to_depth, sobel_edges, high_pass_x_y,
    total_variation, total_variation_map, resize_with_crop_or_pad, renorm,
)
from denoise_gan_tpu.ops.image import resize_bicubic

tf = pytest.importorskip("tensorflow")


def test_depth_to_space_matches_tf(rng):
    x = rng.standard_normal((2, 4, 6, 12)).astype(np.float32)
    got = np.asarray(depth_to_space(jnp.asarray(x), 2))
    want = tf.nn.depth_to_space(x, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_space_to_depth_matches_tf(rng):
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    got = np.asarray(space_to_depth(jnp.asarray(x), 2))
    want = tf.nn.space_to_depth(x, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_depth_space_roundtrip(rng):
    x = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(jnp.asarray(x), 4), 4)), x)


def test_sobel_edges_matches_tf(rng):
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(sobel_edges(jnp.asarray(x)))
    want = tf.image.sobel_edges(tf.constant(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_total_variation_matches_tf(rng):
    x = rng.random((3, 32, 32, 3)).astype(np.float32)
    got = np.asarray(total_variation(jnp.asarray(x)))
    want = tf.image.total_variation(tf.constant(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_high_pass_shapes(rng):
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    dx, dy = high_pass_x_y(jnp.asarray(x))
    assert dx.shape == (1, 7, 7, 3) and dy.shape == (1, 7, 7, 3)
    assert total_variation_map(jnp.asarray(x)).shape == (1, 7, 7, 3)


def test_resize_with_crop_or_pad_matches_tf(rng):
    x = rng.random((1, 30, 50, 3)).astype(np.float32)
    for th, tw in [(64, 64), (16, 64), (64, 32), (16, 16)]:
        got = np.asarray(resize_with_crop_or_pad(jnp.asarray(x), th, tw))
        want = tf.image.resize_with_crop_or_pad(tf.constant(x), th, tw).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_bicubic_matches_tf(rng):
    """Parity with tf.image.resize(method='bicubic') at its TF2 default
    antialias=False — the reference's degradation downscale
    (/root/reference/dataloader.py:121-123).  Exact at integer ratios (the
    training path); tiny edge-kernel differences at fractional ratios."""
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    for (h, w), atol in [((16, 16), 1e-5), ((32, 32), 1e-5),
                         ((128, 128), 1e-5), ((17, 23), 2e-3)]:
        got = np.asarray(resize_bicubic(jnp.asarray(x), h, w))
        want = tf.image.resize(tf.constant(x), (h, w),
                               method="bicubic").numpy()
        np.testing.assert_allclose(got, want, atol=atol)


def test_renorm_range():
    x = jnp.array([[-2.0, -1.0, 0.0, 1.0, 2.0]])
    out = np.asarray(renorm(x))
    np.testing.assert_allclose(out, [[0.0, 0.0, 0.5, 1.0, 1.0]])


def test_unit_test_classical_denoisers(rng):
    """The root unit_test.py's classical comparison filters: medianBlur
    (what the reference calls) and the fastNlMeansDenoisingColored wrapper
    it ships unused (/root/reference/unit_test.py:32-34) — both must map
    [0,1] float -> [0,1] float at the same shape and actually smooth."""
    import importlib
    ut = importlib.import_module("unit_test")

    # smooth gradient + mild iid noise (NL-means needs similar patches to
    # average; pure uniform noise defeats it)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    base = np.stack([yy, xx, (yy + xx) / 2], axis=-1) * 0.5 + 0.25
    img = np.clip(base + rng.normal(0, 0.08, base.shape), 0, 1) \
        .astype(np.float32)
    for fn in (ut.denoise_median, ut.denoise_nlmeans):
        out = fn(img)
        assert out.shape == img.shape and out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0
        # a denoiser must reduce pixelwise total variation of the noise
        tv = lambda a: np.abs(np.diff(a, axis=0)).mean() + \
            np.abs(np.diff(a, axis=1)).mean()
        assert tv(out) < 0.8 * tv(img)
