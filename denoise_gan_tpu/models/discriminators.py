"""PatchGAN discriminators shared across the model families.

* :class:`PatchDiscriminator` — the Fast-SRGAN-style stack of 8 conv blocks
  (df=32, strides alternating 1/2, BN momentum 0.8, LeakyReLU 0.2) with a 1x1
  conv head.  Used with logits output by SRGAN/FSRGAN
  (/root/reference/srgan.py:232-272, /root/reference/fsrgan.py:222-258) and
  with a sigmoid head by the autoencoder (/root/reference/autoencoder.py:190-228).
* :class:`SRGANPaperDiscriminator` — the larger SRGAN-paper discriminator that
  exists unused in the reference (/root/reference/srgan.py:188-230); built and
  selectable here for completeness.
* :class:`ConditionalPatchDiscriminator` — pix2pix's conditional D on
  concat([input, target]) -> 30x30 logits (/root/reference/pix2pix.py:194-220).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from denoise_gan_tpu.models.layers import (
    BatchNorm, Conv, conv3x3, gamma_normal02, glorot_uniform, leaky_relu,
    normal02,
)


class PatchDiscriminator(nn.Module):
    """8 d_blocks (df, df, df, df, 2df, 2df, 2df, 2df; strides 1,2,1,2,...)
    then 1x1 conv -> per-patch score.  Output is f32.

    sigmoid_head=False -> raw logits (srgan/fsrgan, BCE-from-logits);
    sigmoid_head=True  -> probabilities (autoencoder, plain BCE).
    """

    df: int = 32
    sigmoid_head: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype or x.dtype)

        def d_block(h, filters, strides=1, bn=True):
            h = conv3x3(filters, strides=strides, dtype=self.dtype)(h)
            if bn:
                h = BatchNorm(momentum=0.8, dtype=self.dtype)(h, train)
            return leaky_relu(h, 0.2)

        x = d_block(x, self.df, bn=False)
        x = d_block(x, self.df, strides=2)
        x = d_block(x, self.df)
        x = d_block(x, self.df, strides=2)
        x = d_block(x, self.df * 2)
        x = d_block(x, self.df * 2, strides=2)
        x = d_block(x, self.df * 2)
        x = d_block(x, self.df * 2, strides=2)

        x = Conv(1, (1, 1), padding="SAME", dtype=self.dtype,
                 param_dtype=jnp.float32)(x)
        x = x.astype(jnp.float32)  # f32 head (/root/reference/srgan.py:270)
        return nn.sigmoid(x) if self.sigmoid_head else x


class SRGANPaperDiscriminator(nn.Module):
    """The SRGAN-paper-style deep discriminator (unused default in the
    reference, /root/reference/srgan.py:188-230): 4x4 stride-2 conv pyramid to
    64x df filters, 1x1/3x3 residual refinement, 1x1 conv score head."""

    df: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype or x.dtype)
        w_init = normal02()

        def disc_block(h, filters, kernel=4, strides=2, bn=True, lrelu=True):
            h = Conv(filters, (kernel, kernel), strides=(strides, strides),
                     padding="SAME", use_bias=not bn, kernel_init=w_init,
                     dtype=self.dtype, param_dtype=jnp.float32)(h)
            if bn:
                h = BatchNorm(gamma_init=gamma_normal02,
                              dtype=self.dtype)(h, train)
            if lrelu:
                h = leaky_relu(h, 0.2)
            return h

        n = disc_block(x, self.df, bn=False)
        n = disc_block(n, self.df * 2)
        n = disc_block(n, self.df * 4)
        n = disc_block(n, self.df * 8)
        n = disc_block(n, self.df * 16)
        n = disc_block(n, self.df * 32)
        n = disc_block(n, self.df * 16, kernel=1, strides=1)
        nn_skip = disc_block(n, self.df * 8, kernel=1, strides=1, lrelu=False)
        n = disc_block(nn_skip, self.df * 2, kernel=1, strides=1)
        n = disc_block(n, self.df * 2, kernel=3, strides=1)
        n = disc_block(n, self.df * 8, kernel=3, strides=1, lrelu=False)
        n = n + nn_skip
        out = Conv(1, (1, 1), padding="SAME", kernel_init=w_init,
                   dtype=self.dtype, param_dtype=jnp.float32)(n)
        return out.astype(jnp.float32)


class ConditionalPatchDiscriminator(nn.Module):
    """pix2pix conditional PatchGAN: concat(input, target) -> three stride-2
    downsample blocks -> zero-pad -> 4x4 conv(512) -> BN -> LeakyReLU ->
    zero-pad -> 4x4 conv(1) logits (30x30 for 256 inputs)
    (/root/reference/pix2pix.py:194-220)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inp, tar, train: bool = True):
        w_init = normal02()
        x = jnp.concatenate([inp, tar], axis=-1)
        x = x.astype(self.dtype or x.dtype)

        def downsample(h, filters, bn=True):
            h = Conv(filters, (4, 4), strides=(2, 2), padding="SAME",
                     use_bias=False, kernel_init=w_init, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
            if bn:
                h = BatchNorm(dtype=self.dtype)(h, train)
            # Keras LeakyReLU default alpha=0.3 (/root/reference/pix2pix.py:121)
            return leaky_relu(h, 0.3)

        x = downsample(x, 64, bn=False)
        x = downsample(x, 128)
        x = downsample(x, 256)

        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = Conv(512, (4, 4), strides=(1, 1), padding="VALID", use_bias=False,
                 kernel_init=w_init, dtype=self.dtype,
                 param_dtype=jnp.float32)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = leaky_relu(x, 0.3)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = Conv(1, (4, 4), strides=(1, 1), padding="VALID",
                 kernel_init=w_init, dtype=self.dtype,
                 param_dtype=jnp.float32)(x)
        return x.astype(jnp.float32)
