"""Pallas fused inverted-residual kernel vs the plain Flax body
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib.util as _ilu
import os
_spec = _ilu.spec_from_file_location(
    "exp_mbconv_kernel",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "exp_mbconv_kernel.py"))
mbconv = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(mbconv)
from denoise_gan_tpu.models.fsrgan import FSRGANBody


@pytest.fixture
def interpreted(monkeypatch):
    monkeypatch.setattr(mbconv, "fused_mbconv",
                        functools.partial(mbconv.fused_mbconv,
                                          interpret=True))


def test_pallas_body_matches_flax(rng, interpreted):
    body = FSRGANBody()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    variables = body.init(jax.random.key(0), x, train=False)
    want = body.apply(variables, x, train=False)
    fwd = mbconv.build_pallas_fsrgan_body(variables["params"],
                                          variables["batch_stats"],
                                          dtype=jnp.float32)
    got = fwd(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_fold_conv_bn_identity(rng):
    """Folded conv+BN == conv then affine-with-running-stats."""
    k = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    bn_p = {"scale": rng.uniform(0.5, 2, 8).astype(np.float32),
            "bias": rng.standard_normal(8).astype(np.float32)}
    bn_s = {"mean": rng.standard_normal(8).astype(np.float32),
            "var": rng.uniform(0.5, 2, 8).astype(np.float32)}
    kf, bf = mbconv.fold_conv_bn(k, b, bn_p, bn_s, eps=1e-3)

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    conv = lambda kk: jax.lax.conv_general_dilated(
        x, jnp.asarray(kk), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_ref = conv(k) + b
    s = bn_p["scale"] / np.sqrt(bn_s["var"] + 1e-3)
    y_ref = (y_ref - bn_s["mean"]) * s + bn_p["bias"]
    y_fold = conv(kf) + bf
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
