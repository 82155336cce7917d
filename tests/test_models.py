"""Shape/dtype tests for all model families (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.models import build_models, FAMILIES
from denoise_gan_tpu.models.vgg import VGG19Features, init_vgg_params, content_features


def _init_and_apply(module, x, train=False, cond=None):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    if cond is not None:
        variables = module.init(rngs, cond, x, train=False)
        out = module.apply(variables, cond, x, train=train,
                           rngs={"dropout": jax.random.key(2)},
                           mutable=["batch_stats"])[0]
    else:
        variables = module.init(rngs, x, train=False)
        out = module.apply(variables, x, train=train,
                           rngs={"dropout": jax.random.key(2)},
                           mutable=["batch_stats"])[0]
    return out


def test_autoencoder_shapes():
    b = build_models("autoencoder", scale=1)
    x = jnp.zeros((2, 64, 64, 3))
    out = _init_and_apply(b.generator, x)
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == jnp.float32
    d = _init_and_apply(b.discriminator, x)
    assert d.shape == (2, 4, 4, 1)          # 64 / 2^4 PatchGAN grid
    assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0  # sigmoid head


def test_srgan_shapes():
    b = build_models("srgan", scale=4)
    x = jnp.zeros((1, 16, 16, 3))
    out = _init_and_apply(b.generator, x)
    assert out.shape == (1, 64, 64, 3)      # 4x upsample
    d = _init_and_apply(b.discriminator, jnp.zeros((1, 64, 64, 3)))
    assert d.shape == (1, 4, 4, 1)


def test_fsrgan_shapes():
    b = build_models("fsrgan", scale=4)
    x = jnp.zeros((1, 16, 16, 3))
    out = _init_and_apply(b.generator, x)
    assert out.shape == (1, 64, 64, 3)


def test_pix2pix_shapes():
    b = build_models("pix2pix", scale=1)
    x = jnp.zeros((1, 256, 256, 3))
    out = _init_and_apply(b.generator, x, train=True)
    assert out.shape == (1, 256, 256, 3)
    d = _init_and_apply(b.discriminator, x, cond=x)
    assert d.shape == (1, 30, 30, 1)        # the canonical 30x30 patch logits


def test_generators_bounded_by_tanh():
    b = build_models("fsrgan", scale=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 16, 16, 3)),
                    jnp.float32)
    out = _init_and_apply(b.generator, x)
    assert float(jnp.abs(out).max()) <= 1.0


def test_bf16_policy_keeps_f32_outputs():
    b = build_models("fsrgan", scale=4, fp16=True)
    x = jnp.zeros((1, 16, 16, 3))
    out = _init_and_apply(b.generator, x)
    assert out.dtype == jnp.float32         # f32 tanh head under bf16 compute
    params = b.generator.init(jax.random.key(0), x, train=False)["params"]
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))


def test_vgg_features_shape_and_determinism():
    params = init_vgg_params(weights_path="/nonexistent")  # forced fallback
    x = jnp.zeros((1, 64, 64, 3))
    feats = content_features(params, x)
    assert feats.shape == (1, 4, 4, 512)    # 64 / 2^4, 512ch at block5_conv4
    params2 = init_vgg_params(weights_path="/nonexistent")
    chex = np.testing.assert_allclose
    for a, b_ in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        chex(np.asarray(a), np.asarray(b_))
