"""The coarse-space tail rewrite must be numerically exact vs the plain
generator (same weights, reindexed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.infer.fast import (
    build_fast_forward, d2s_perm, scatter_conv_kernel,
)
from denoise_gan_tpu.models import build_models
from denoise_gan_tpu.ops.image import depth_to_space


def test_scatter_kernel_identity_m1(rng):
    W = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(scatter_conv_kernel(W, 1), W)


def test_scattered_conv_equals_fine_conv(rng):
    """conv3x3 applied after d2s == scattered conv applied before d2s."""
    m, c, o = 2, 8, 16
    W = rng.standard_normal((3, 3, c, o)).astype(np.float32)
    coarse = rng.standard_normal((1, 8, 8, m * m * c)).astype(np.float32)

    fine = depth_to_space(jnp.asarray(coarse), m)   # (1, 16, 16, c)
    want = jax.lax.conv_general_dilated(
        fine, jnp.asarray(W), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    K = scatter_conv_kernel(W, m)
    got_coarse = jax.lax.conv_general_dilated(
        jnp.asarray(coarse), jnp.asarray(K), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # canonical layout == TF d2s order for a single level
    got = depth_to_space(got_coarse, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_d2s_perm_roundtrip(rng):
    """perm converts post-conv canonical channels to next-scale canonical:
    d2s(2m) of permuted == d2s(m) then d2s(2) of unpermuted."""
    m, c_next = 2, 4
    coarse = rng.standard_normal((1, 4, 4, m * m * 4 * c_next)).astype(np.float32)
    x = jnp.asarray(coarse)
    want = depth_to_space(depth_to_space(x, m), 2)    # fine (1,16,16,c_next)
    perm = d2s_perm(m, c_next)
    got = depth_to_space(x[..., jnp.asarray(perm)], 2 * m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("family,scale", [("fsrgan", 4), ("srgan", 4),
                                          ("srgan", 2)])
def test_fast_forward_matches_plain(rng, family, scale):
    bundle = build_models(family, scale=scale)   # f32 for exactness
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)

    want = bundle.generator.apply(variables, x, train=False)
    fast = build_fast_forward({"family": family, "scale": scale},
                              variables["params"],
                              variables.get("batch_stats", {}),
                              dtype=jnp.float32)
    got = fast(x)
    assert got.shape == want.shape == (1, 16 * scale, 16 * scale, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fast_forward_fallback_autoencoder(rng):
    bundle = build_models("autoencoder", scale=1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False)
    fast = build_fast_forward({"family": "autoencoder", "scale": 1},
                              variables["params"], {}, dtype=jnp.float32)
    want = bundle.generator.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(fast(x)), np.asarray(want),
                               atol=1e-5)
