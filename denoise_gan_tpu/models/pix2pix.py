"""pix2pix U-Net generator.

TPU-native rebuild of /root/reference/pix2pix.py:106-192: 8 downsample blocks
(4x4 stride-2 conv, no bias, BN except the first, LeakyReLU) to a 1x1x512
bottleneck, 7 upsample blocks (4x4 stride-2 transpose conv, no bias, BN,
dropout 0.5 on the first three, ReLU) with skip concats, then a final 4x4
stride-2 transpose conv -> tanh.  Kernels N(0, 0.02).  Requires H, W to be
multiples of 256 (the canonical 256x256 crop), like the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from denoise_gan_tpu.models.layers import BatchNorm, Conv, leaky_relu, normal02


class Downsample(nn.Module):
    filters: int
    apply_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.filters, (4, 4), strides=(2, 2), padding="SAME",
                 use_bias=False, kernel_init=normal02(), dtype=self.dtype,
                 param_dtype=jnp.float32)(x)
        if self.apply_batchnorm:
            x = BatchNorm(dtype=self.dtype)(x, train)
        return leaky_relu(x, 0.3)  # Keras LeakyReLU default alpha


class Upsample(nn.Module):
    filters: int
    apply_dropout: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.ConvTranspose(self.filters, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             kernel_init=normal02(), dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        if self.apply_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.relu(x)


class Pix2PixGenerator(nn.Module):
    output_channels: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype or x.dtype)

        down_specs = [(64, False)] + [(128, True), (256, True)] + [(512, True)] * 5
        up_specs = [(512, True)] * 3 + [(512, False), (256, False),
                                        (128, False), (64, False)]

        skips = []
        for filters, bn in down_specs:
            x = Downsample(filters, apply_batchnorm=bn, dtype=self.dtype)(x, train)
            skips.append(x)

        skips = list(reversed(skips[:-1]))
        for (filters, dropout), skip in zip(up_specs, skips):
            x = Upsample(filters, apply_dropout=dropout, dtype=self.dtype)(x, train)
            x = jnp.concatenate([x, skip], axis=-1)

        x = nn.ConvTranspose(self.output_channels, (4, 4), strides=(2, 2),
                             padding="SAME", kernel_init=normal02(),
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        return jnp.tanh(x.astype(jnp.float32))
