"""Denoising conv autoencoder (5-level U-Net-ish encoder/decoder).

TPU-native rebuild of /root/reference/autoencoder.py:89-188:
encoder conv(32,32)+pool, conv(44)+pool, conv(56)+pool, conv(76)+pool,
conv(100)+pool; decoder: nearest-neighbor upsample + ReLU ("unpool") with a
skip concat at each level — including a final skip to the raw input — conv
channel plan 152,152 / 112,112 / 84,84 / 64,64 / 64,32, then a 3-channel tanh
conv.  ReLU convs use he_normal init, the tanh conv lecun_normal
(/root/reference/autoencoder.py:94-100).  Operates at input resolution
(scale=1 denoising task).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from denoise_gan_tpu.models.layers import (
    conv3x3, he_normal, lecun_normal, max_pool_same, upsample_nearest,
)


class AutoencoderGenerator(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train  # no BatchNorm in this generator
        img = x.astype(self.dtype or x.dtype)

        def conv_relu(h, filters):
            return nn.relu(conv3x3(filters, kernel_init=he_normal,
                                   dtype=self.dtype)(h))

        def unpool_concat(a, b):
            # UpSampling2D(nearest) + relu, concat with encoder skip
            # (/root/reference/autoencoder.py:113-136)
            up = nn.relu(upsample_nearest(a, 2))
            return jnp.concatenate([up, b], axis=-1)

        h = conv_relu(img, 32)
        h = conv_relu(h, 32)
        pool1 = h = max_pool_same(h)            # 256 -> 128

        h = conv_relu(h, 44)
        pool2 = h = max_pool_same(h)            # 128 -> 64

        h = conv_relu(h, 56)
        pool3 = h = max_pool_same(h)            # 64 -> 32

        h = conv_relu(h, 76)
        pool4 = h = max_pool_same(h)            # 32 -> 16

        h = conv_relu(h, 100)
        h = max_pool_same(h)                    # 16 -> 8

        h = unpool_concat(h, pool4)
        h = conv_relu(h, 152)
        h = conv_relu(h, 152)

        h = unpool_concat(h, pool3)
        h = conv_relu(h, 112)
        h = conv_relu(h, 112)

        h = unpool_concat(h, pool2)
        h = conv_relu(h, 84)
        h = conv_relu(h, 84)

        h = unpool_concat(h, pool1)
        h = conv_relu(h, 64)
        h = conv_relu(h, 64)

        h = unpool_concat(h, img)
        h = conv_relu(h, 64)
        h = conv_relu(h, 32)

        out = conv3x3(3, kernel_init=lecun_normal, dtype=self.dtype)(h)
        return jnp.tanh(out.astype(jnp.float32))
