"""SRGAN (SRResNet) generator.

TPU-native rebuild of /root/reference/srgan.py:129-185:
conv64(no-bias)+BN(gamma~N(1,.02))+PReLU stem, 16 residual blocks
(conv-BN-ReLU-conv-BN + add), post-res conv+BN with global skip,
``scale//2`` pixel-shuffle x2 upsample stages (conv256 -> depth_to_space(2)
-> PReLU), 1x1 conv -> tanh with an f32 output activation.  Kernels are
N(0, 0.02) per the reference's w_init.  Shape-agnostic (any H, W).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from denoise_gan_tpu.models.layers import (
    BatchNorm, Conv, PixelShuffleUp, PReLU, conv3x3, gamma_normal02, normal02,
)


class SRGANBody(nn.Module):
    """Stem + 16 residual blocks + post-conv with global skip, at input
    resolution (/root/reference/srgan.py:154-175)."""

    num_res_blocks: int = 16
    filters: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        w_init = normal02()
        x = x.astype(self.dtype or x.dtype)

        n = conv3x3(self.filters, use_bias=False, kernel_init=w_init,
                    dtype=self.dtype)(x)
        n = BatchNorm(gamma_init=gamma_normal02, dtype=self.dtype)(n, train)
        n = PReLU(dtype=self.dtype)(n)
        temp = n

        for _ in range(self.num_res_blocks):
            nn_ = conv3x3(self.filters, use_bias=False, kernel_init=w_init,
                          dtype=self.dtype)(n)
            nn_ = BatchNorm(gamma_init=gamma_normal02,
                            dtype=self.dtype)(nn_, train)
            nn_ = nn.relu(nn_)
            nn_ = conv3x3(self.filters, use_bias=False, kernel_init=w_init,
                          dtype=self.dtype)(nn_)
            nn_ = BatchNorm(gamma_init=gamma_normal02,
                            dtype=self.dtype)(nn_, train)
            n = n + nn_

        n = conv3x3(self.filters, use_bias=False, kernel_init=w_init,
                    dtype=self.dtype)(n)
        n = BatchNorm(gamma_init=gamma_normal02, dtype=self.dtype)(n, train)
        return n + temp


class SRGANTail(nn.Module):
    """scale//2 pixel-shuffle 2x stages (conv256 each) + 1x1 conv + f32 tanh
    (/root/reference/srgan.py:179-183).  infer/fast.py consumes these params
    for the coarse-space inference rewrite."""

    scale: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        w_init = normal02()
        for i in range(self.scale // 2):
            x = PixelShuffleUp(256, kernel_init=w_init, dtype=self.dtype,
                               name=f"up{i + 1}")(x)
        out = Conv(3, (1, 1), padding="SAME", kernel_init=w_init,
                   dtype=self.dtype, param_dtype=jnp.float32,
                   name="out_conv")(x)
        return jnp.tanh(out.astype(jnp.float32))  # f32 tanh head (srgan.py:183)


class SRGANGenerator(nn.Module):
    """16-resblock SRResNet; `scale` in {1, 2, 4, 8} controls the number of
    2x pixel-shuffle stages (scale // 2 stages, as the reference)."""

    scale: int = 4
    num_res_blocks: int = 16
    filters: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = SRGANBody(self.num_res_blocks, self.filters, dtype=self.dtype,
                      name="body")(x, train)
        return SRGANTail(self.scale, dtype=self.dtype, name="tail")(h)
