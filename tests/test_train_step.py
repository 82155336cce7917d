"""Train-step tests: loss math vs closed form, a full jitted GAN step per
family, and the multi-device sharded step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.losses.gan import bce_logits, bce_probs, l1_loss, l2_loss, tv_loss
from denoise_gan_tpu.models import build_models
from denoise_gan_tpu.models.vgg import init_vgg_params
from denoise_gan_tpu.parallel.mesh import make_mesh, shard_batch
from denoise_gan_tpu.train.state import create_train_state, param_count
from denoise_gan_tpu.train.step import build_train_step, jit_train_step
from denoise_gan_tpu.utils.config import make_config


def test_bce_logits_closed_form():
    logits = jnp.array([0.0, 100.0, -100.0])
    ones = jnp.ones_like(logits)
    got = float(bce_logits(ones, logits))
    want = np.mean([np.log(2.0), 0.0, 100.0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_probs_matches_keras_clipping():
    probs = jnp.array([0.5, 1.0, 0.0])
    got = float(bce_probs(jnp.ones_like(probs), probs))
    want = np.mean([np.log(2.0), 0.0, -np.log(1e-7)])
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_l1_l2_tv():
    a = jnp.zeros((1, 4, 4, 1))
    b = jnp.ones((1, 4, 4, 1))
    assert float(l1_loss(a, b)) == 1.0
    assert float(l2_loss(a, b)) == 1.0
    assert float(tv_loss(a, b)) == 0.0  # constant difference: no variation


def _tiny_cfg(family, crop=32, scale=None):
    cfg = make_config(family)
    cfg.crop_size = crop
    if scale is not None:
        cfg.scale = scale
    cfg.batch_size = 2
    return cfg.finalize()


@pytest.mark.parametrize("family,scale,crop", [
    ("autoencoder", 1, 32),
    ("srgan", 4, 32),
    ("fsrgan", 4, 32),
    ("pix2pix", 1, 256),
])
def test_full_train_step(family, scale, crop):
    cfg = _tiny_cfg(family, crop=crop, scale=scale)
    bundle = build_models(family, scale=cfg.scale)
    state = create_train_state(bundle, cfg, jax.random.key(0))
    assert param_count(state.gen.params) > 0
    vgg = init_vgg_params(weights_path="/nonexistent")
    step = jit_train_step(build_train_step(bundle, cfg))

    hr = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, crop, crop, 3)),
        jnp.float32)
    # snapshot before stepping: the jitted step donates the input state
    before = jax.tree.map(np.asarray, state.gen.params)
    state2, metrics = step(state, vgg, hr, jax.random.key(1))
    assert int(state2.step) == 1
    for k in ("gen_loss", "disc_loss", "adv_loss", "content_loss",
              "mse_loss", "mae_loss", "psnr"):
        v = float(metrics[k])
        assert np.isfinite(v), (k, v)
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()),
                         before, state2.gen.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_sharded_train_step_8_devices():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    cfg = _tiny_cfg("fsrgan", crop=32, scale=4)
    cfg.batch_size = 8
    bundle = build_models("fsrgan", scale=4)
    state = create_train_state(bundle, cfg, jax.random.key(0))
    vgg = init_vgg_params(weights_path="/nonexistent")
    step = jit_train_step(build_train_step(bundle, cfg), mesh)

    hr = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    hr = shard_batch(hr, mesh)
    state2, metrics = step(state, vgg, hr, jax.random.key(1))
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert int(state2.step) == 1


def test_train_step_determinism():
    cfg = _tiny_cfg("fsrgan", crop=32, scale=4)
    bundle = build_models("fsrgan", scale=4)
    vgg = init_vgg_params(weights_path="/nonexistent")
    step = jit_train_step(build_train_step(bundle, cfg))
    hr = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)), jnp.float32)

    outs = []
    for _ in range(2):
        state = create_train_state(bundle, cfg, jax.random.key(0))
        _, metrics = step(state, vgg, hr, jax.random.key(1))
        outs.append(float(metrics["gen_loss"]))
    assert outs[0] == outs[1]


def test_pre_degraded_step_matches_on_device_degradation():
    """build_train_step(degrade=False) consumes (img_in, img_tgt) pairs
    directly; feeding it the exact tensors degrade_pair would produce must
    reproduce the degrade=True step to float tolerance (standalone vs
    fused-into-the-step degradation round differently under XLA fusion;
    the lockstep h2h diagnostic depends on this equivalence,
    tools/h2h_lockstep.py)."""
    from denoise_gan_tpu.data.degrade import degrade_pair

    cfg = _tiny_cfg("srgan", crop=32, scale=4)
    bundle = build_models("srgan", scale=cfg.scale)
    vgg = init_vgg_params(weights_path="/nonexistent")
    hr = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    rng = jax.random.key(3)

    state_a = create_train_state(bundle, cfg, jax.random.key(0))
    step_a = jit_train_step(build_train_step(bundle, cfg))
    state_a, m_a = step_a(state_a, vgg, hr, rng)

    # replicate the step's internal degradation (step.py folds rng by step)
    folded = jax.random.fold_in(rng, 0)
    quality_rng = jax.random.split(folded, 3)[0]
    pair = degrade_pair(hr, cfg.scale, cfg.jpeg_quality, rng=quality_rng,
                        random_quality=False)

    state_b = create_train_state(bundle, cfg, jax.random.key(0))
    step_b = jit_train_step(build_train_step(bundle, cfg, degrade=False))
    state_b, m_b = step_b(state_b, vgg, pair, rng)

    np.testing.assert_allclose(float(m_a["gen_loss"]),
                               float(m_b["gen_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_a["disc_loss"]),
                               float(m_b["disc_loss"]), rtol=1e-6)
    worst = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state_a.gen.params, state_b.gen.params)
    assert max(jax.tree.leaves(worst)) < 1e-5
