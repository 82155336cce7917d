"""On-device quality metrics: PSNR and SSIM.

The reference computes **no** quality metrics anywhere (SURVEY.md §6); the
rebuild's BASELINE requires on-device PSNR/SSIM.  These match the semantics of
tf.image.psnr / tf.image.ssim (11x11 Gaussian window, sigma 1.5, k1=0.01,
k2=0.03) so scores are comparable with TF-computed values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR over NHWC batches; returns shape (N,)."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


def _fspecial_gauss(size: int, sigma: float) -> jax.Array:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = jnp.outer(g, g)
    return g / jnp.sum(g)


def _depthwise(x: jax.Array, kernel2d: jax.Array) -> jax.Array:
    c = x.shape[-1]
    # grouped-conv HWIO kernel: (H, W, in/groups=1, out=c)
    k = jnp.tile(kernel2d[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Per-image mean SSIM over NHWC batches; returns shape (N,).

    Matches tf.image.ssim: Gaussian-windowed local statistics, luminance *
    contrast-structure, averaged over space and channels.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    win = _fspecial_gauss(filter_size, filter_sigma)

    mu_a = _depthwise(a, win)
    mu_b = _depthwise(b, win)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _depthwise(a * a, win) - mu_aa
    sigma_bb = _depthwise(b * b, win) - mu_bb
    sigma_ab = _depthwise(a * b, win) - mu_ab

    luminance = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = luminance * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3))
