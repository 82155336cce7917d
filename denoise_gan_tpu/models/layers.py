"""Shared Flax building blocks for all four model families.

Conventions (matching the TF reference's Keras layers):
* NHWC layout everywhere (TPU-native conv layout).
* 'SAME' padding semantics = TF (asymmetric for stride 2).
* Keras Conv2D defaults: glorot_uniform kernels, zero bias — flax defaults are
  lecun_normal, so initializers are set explicitly wherever the reference used
  Keras defaults.
* Mixed precision: ``dtype=bfloat16`` for conv compute when ``--fp16`` is set,
  f32 params, f32 BatchNorm statistics, f32 output activations — the bf16
  analog of the reference's mixed_float16-with-f32-outputs discipline
  (/root/reference/srgan.py:183, 270); no loss scaling is needed on TPU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from denoise_gan_tpu.ops.image import depth_to_space

Dtype = Any

# Keras initializer equivalents
glorot_uniform = nn.initializers.glorot_uniform()
he_normal = nn.initializers.he_normal()
lecun_normal = nn.initializers.lecun_normal()


def normal02() -> Callable:
    """tf.random_normal_initializer(0., 0.02) (/root/reference/srgan.py:130)."""
    return nn.initializers.normal(stddev=0.02)


def gamma_normal02(key, shape, dtype=jnp.float32):
    """BN gamma init N(1, 0.02) (/root/reference/srgan.py:131)."""
    return 1.0 + nn.initializers.normal(stddev=0.02)(key, shape, dtype)


class PReLU(nn.Module):
    """Keras PReLU(shared_axes=[1, 2]): one slope per channel, zero-init
    (/root/reference/srgan.py:146)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],),
                           jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def leaky_relu(x, alpha: float = 0.2):
    return jnp.where(x >= 0, x, alpha * x)


class BatchNorm(nn.Module):
    """Keras-convention BatchNormalization.

    momentum/epsilon defaults = Keras defaults (0.99 / 1e-3); statistics and
    normalization are computed in f32 regardless of the compute dtype.  Under
    a sharded batch axis, GSPMD computes the batch mean/var over the *global*
    batch (SURVEY.md §7 "BatchNorm everywhere").
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    gamma_init: Callable = nn.initializers.ones
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", self.gamma_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            # biased variance, like tf.nn.moments under Keras BN; under a
            # sharded batch axis GSPMD reduces over the GLOBAL batch.
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
            return y.astype(self.dtype or x.dtype)
        # Eval fast path: BN with running stats is a per-channel affine; fold
        # it to (mul, add) in f32 (tiny vectors), then apply in the compute
        # dtype — no full-tensor f32 round trip, and XLA fuses the affine into
        # the producing conv's epilogue.
        mul = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
        add = bias - ra_mean.value * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class Conv(nn.Conv):
    """nn.Conv with Keras defaults (glorot_uniform kernel, zero bias)."""

    kernel_init: Callable = glorot_uniform


def conv3x3(features: int, strides: int = 1, use_bias: bool = True,
            kernel_init: Callable = glorot_uniform,
            dtype: Optional[Dtype] = None, name: Optional[str] = None) -> Conv:
    return Conv(features, (3, 3), strides=(strides, strides), padding="SAME",
                use_bias=use_bias, kernel_init=kernel_init, dtype=dtype,
                param_dtype=jnp.float32, name=name)


class PixelShuffleUp(nn.Module):
    """conv(filters) -> depth_to_space(2) -> PReLU: the SRGAN/FSRGAN
    'deconv2d' upsample (/root/reference/srgan.py:134-147,
    /root/reference/fsrgan.py:178-190)."""

    filters: int
    kernel_init: Callable = glorot_uniform
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = conv3x3(self.filters, kernel_init=self.kernel_init,
                    dtype=self.dtype)(x)
        x = depth_to_space(x, 2)
        return PReLU(dtype=self.dtype)(x)


def max_pool_same(x, k: int = 2):
    """Keras MaxPool2D(pool=k, strides=k, padding='same')
    (/root/reference/autoencoder.py:107-111)."""
    return nn.max_pool(x, window_shape=(k, k), strides=(k, k), padding="SAME")


def upsample_nearest(x, factor: int = 2):
    """Keras UpSampling2D(interpolation='nearest')
    (/root/reference/autoencoder.py:122)."""
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)
