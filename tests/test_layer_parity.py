"""Layer-level numerical parity vs TF/Keras oracles: SAME-padding convs
(stride 1/2), transposed conv, BatchNorm (train & eval), PReLU, LeakyReLU,
pooling and nearest upsampling — the exact layer vocabulary of the reference
models (SURVEY.md §7 'Numerical parity within tolerance')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from denoise_gan_tpu.models.layers import (
    BatchNorm, PReLU, conv3x3, leaky_relu, max_pool_same, upsample_nearest,
)

tf = pytest.importorskip("tensorflow")


def _keras_conv_weights(keras_layer, flax_params):
    """Copy flax {kernel, bias} into a built Keras conv layer."""
    w = [np.asarray(flax_params["kernel"])]
    if "bias" in flax_params:
        w.append(np.asarray(flax_params["bias"]))
    keras_layer.set_weights(w)


@pytest.mark.parametrize("strides", [1, 2])
def test_conv_same_padding_matches_keras(rng, strides):
    x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
    mod = conv3x3(8, strides=strides)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    klayer = tf.keras.layers.Conv2D(8, 3, strides=strides, padding="same")
    klayer.build((None, 9, 9, 4))
    _keras_conv_weights(klayer, params)
    want = klayer(tf.constant(x)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size,strides", [(4, 2)])
def test_conv_transpose_matches_keras(rng, size, strides):
    """pix2pix upsample blocks use Conv2DTranspose(4, strides=2, 'same')
    (/root/reference/pix2pix.py:130)."""
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    mod = nn.ConvTranspose(6, (size, size), strides=(strides, strides),
                           padding="SAME", use_bias=False)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    klayer = tf.keras.layers.Conv2DTranspose(6, size, strides=strides,
                                             padding="same", use_bias=False)
    klayer.build((None, 8, 8, 3))
    # flax ConvTranspose(default) == Keras Conv2DTranspose with the kernel
    # spatially flipped (layouts: flax (kh,kw,in,out), keras (kh,kw,out,in)).
    # A pure reparametrization: training from N(0, .02) init is equivalent.
    k = np.asarray(params["kernel"]).transpose(0, 1, 3, 2)[::-1, ::-1]
    klayer.set_weights([k])
    want = klayer(tf.constant(x)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_batchnorm_train_matches_keras(rng):
    x = rng.standard_normal((4, 8, 8, 5)).astype(np.float32) * 3 + 1
    mod = BatchNorm(momentum=0.8)
    variables = mod.init(jax.random.key(0), jnp.asarray(x), train=True)
    got, mut = mod.apply(variables, jnp.asarray(x), train=True,
                         mutable=["batch_stats"])

    klayer = tf.keras.layers.BatchNormalization(momentum=0.8, epsilon=1e-3)
    klayer.build((None, 8, 8, 5))
    want = klayer(tf.constant(x), training=True).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
    # moving stats update rule: m*old + (1-m)*batch
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               klayer.moving_mean.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               klayer.moving_variance.numpy(), rtol=1e-2,
                               atol=1e-3)


def test_batchnorm_eval_matches_keras(rng):
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    mod = BatchNorm(momentum=0.8)
    variables = mod.init(jax.random.key(0), jnp.asarray(x), train=True)
    # non-trivial running stats
    variables = {
        "params": variables["params"],
        "batch_stats": {"mean": jnp.asarray([0.5, -0.2, 1.0]),
                        "var": jnp.asarray([2.0, 0.5, 1.5])},
    }
    got = mod.apply(variables, jnp.asarray(x), train=False)

    klayer = tf.keras.layers.BatchNormalization(momentum=0.8, epsilon=1e-3)
    klayer.build((None, 4, 4, 3))
    klayer.set_weights([np.ones(3, np.float32), np.zeros(3, np.float32),
                        np.array([0.5, -0.2, 1.0], np.float32),
                        np.array([2.0, 0.5, 1.5], np.float32)])
    want = klayer(tf.constant(x), training=False).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_prelu_matches_keras(rng):
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    mod = PReLU()
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    variables = {"params": {"alpha": jnp.asarray([0.1, -0.3, 0.5])}}
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    klayer = tf.keras.layers.PReLU(shared_axes=[1, 2])
    klayer.build((None, 4, 4, 3))
    klayer.set_weights([np.array([0.1, -0.3, 0.5], np.float32)
                        .reshape(1, 1, 3)])
    want = klayer(tf.constant(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_leaky_relu_and_pool_and_upsample(rng):
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x), 0.2)),
        tf.keras.layers.LeakyReLU(0.2)(tf.constant(x)).numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(max_pool_same(jnp.asarray(x), 2)),
        tf.keras.layers.MaxPool2D(2, 2, padding="same")(tf.constant(x)).numpy(),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upsample_nearest(jnp.asarray(x), 2)),
        tf.keras.layers.UpSampling2D(2, interpolation="nearest")(
            tf.constant(x)).numpy(), rtol=1e-6)
