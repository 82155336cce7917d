"""Fixed-PRNG golden-value regression tests (SURVEY.md §4 plan).

These pin the numerical behavior of the loss math and the degradation
pipeline for fixed seeds; any refactor that changes results shows up here.
Tolerances are loose enough for cross-hardware reproducibility but tight
enough to catch semantic changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.data.degrade import degrade_pair
from denoise_gan_tpu.losses.gan import bce_logits, content_loss, tv_loss
from denoise_gan_tpu.models.vgg import init_vgg_params
from denoise_gan_tpu.ops.jpeg import jpeg_roundtrip
from denoise_gan_tpu.ops.metrics import psnr, ssim


def _img(seed, shape=(2, 32, 32, 3)):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape),
                       jnp.float32)


def test_golden_jpeg_roundtrip():
    x = _img(0)
    out = jpeg_roundtrip(x, 50)
    err = float(jnp.abs(out - x).mean())
    # pinned 2026-08: mean |degradation| of uniform noise at q50
    np.testing.assert_allclose(err, 0.2068, atol=0.005)


def test_golden_degrade_pair():
    lo, hi = degrade_pair(_img(1, (1, 64, 64, 3)), scale=4, jpeg_quality=50)
    # re-pinned 2026-08 after the antialias=False parity fix (ADVICE r1):
    # non-antialiased 4x downscale of uniform noise keeps ~3.7x more std
    np.testing.assert_allclose(float(lo.mean()), 0.0274, atol=0.02)
    np.testing.assert_allclose(float(lo.std()), 0.2669, atol=0.02)
    assert lo.shape == (1, 16, 16, 3)


def test_golden_losses():
    a, b = _img(2) * 2 - 1, _img(3) * 2 - 1
    np.testing.assert_allclose(float(bce_logits(jnp.ones_like(a), a)),
                               0.7327, atol=2e-3)
    np.testing.assert_allclose(float(tv_loss(a, b)), 5616.8, rtol=2e-3)
    vgg = init_vgg_params(weights_path="/nonexistent")  # fixed-seed VGG
    np.testing.assert_allclose(float(content_loss(vgg, a, b)),
                               float(content_loss(vgg, a, b)))
    assert float(content_loss(vgg, a, b)) > 0
    assert float(content_loss(vgg, a, a)) == 0.0


def test_golden_quality_metrics():
    a, b = _img(4), _img(5)
    np.testing.assert_allclose(float(psnr(a, b).mean()), 7.65, atol=0.05)
    np.testing.assert_allclose(float(ssim(a, a).mean()), 1.0, atol=1e-5)
