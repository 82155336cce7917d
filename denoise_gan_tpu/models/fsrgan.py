"""FastSRGAN generator: MobileNetV2 inverted residuals + pixel shuffle.

TPU-native rebuild of /root/reference/fsrgan.py:99-220: conv32+BN+PReLU stem,
6 inverted-residual blocks (1x1 expand x6 -> BN -> ReLU, 3x3 depthwise -> BN
-> ReLU, 1x1 project -> BN, residual add when shapes match, with
_make_divisible channel rounding and block 0 skipping the expand), post-res
conv+BN+skip, two pixel-shuffle upsample stages (gf*4 = 128 filters), 3-ch
conv -> f32 tanh.  This is the flagship realtime model (the reference's
default video-inference checkpoint, /root/reference/infer_video.py:193).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from denoise_gan_tpu.models.layers import BatchNorm, Conv, PixelShuffleUp, PReLU, conv3x3


def _make_divisible(v, divisor, min_value=None):
    """MobileNetV2 channel rounding (/root/reference/fsrgan.py:103-110)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual block with BN(eps=1e-3, momentum=0.999)
    (/root/reference/fsrgan.py:112-176).  Always stride 1 (as used by the
    reference generator)."""

    filters: int
    block_id: int
    expansion: int = 6
    alpha: float = 1.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        in_channels = inputs.shape[-1]
        pointwise_filters = _make_divisible(int(self.filters * self.alpha), 8)
        x = inputs

        bn = lambda: BatchNorm(momentum=0.999, epsilon=1e-3, dtype=self.dtype)

        if self.block_id:
            x = Conv(self.expansion * in_channels, (1, 1), padding="SAME",
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="expand")(x)
            x = bn()(x, train)
            x = nn.relu(x)

        # depthwise 3x3
        x = Conv(x.shape[-1], (3, 3), padding="SAME",
                 feature_group_count=x.shape[-1], dtype=self.dtype,
                 param_dtype=jnp.float32, name="depthwise")(x)
        x = bn()(x, train)
        x = nn.relu(x)

        x = Conv(pointwise_filters, (1, 1), padding="SAME", dtype=self.dtype,
                 param_dtype=jnp.float32, name="project")(x)
        x = bn()(x, train)

        if in_channels == pointwise_filters:
            return inputs + x
        return x


class FSRGANBody(nn.Module):
    """Stem + inverted residuals + post-conv with global skip; operates at
    input resolution, gf channels."""

    gf: int = 32
    n_residual_blocks: int = 6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype or x.dtype)

        c1 = conv3x3(self.gf, dtype=self.dtype)(x)
        c1 = BatchNorm(dtype=self.dtype)(c1, train)
        c1 = PReLU(dtype=self.dtype)(c1)

        r = InvertedResidual(self.gf, 0, dtype=self.dtype)(c1, train)
        for idx in range(1, self.n_residual_blocks):
            r = InvertedResidual(self.gf, idx, dtype=self.dtype)(r, train)

        c2 = conv3x3(self.gf, dtype=self.dtype)(r)
        c2 = BatchNorm(dtype=self.dtype)(c2, train)
        return c2 + c1


class FSRGANTail(nn.Module):
    """Two pixel-shuffle 2x stages + 3-channel conv + f32 tanh
    (/root/reference/fsrgan.py:213-218).  At inference the algebraically
    equivalent coarse-space rewrite in infer/fast.py consumes these same
    parameters and runs ~5x faster on TPU."""

    gf: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        u1 = PixelShuffleUp(self.gf * 4, dtype=self.dtype, name="up1")(x)
        u2 = PixelShuffleUp(self.gf * 4, dtype=self.dtype, name="up2")(u1)
        out = conv3x3(3, dtype=self.dtype, name="out_conv")(u2)
        return jnp.tanh(out.astype(jnp.float32))  # f32 tanh (fsrgan.py:218)


class FSRGANGenerator(nn.Module):
    """Mobile generator: gf=32, 6 inverted residuals, 2 pixel-shuffle stages
    (fixed 4x upsample, matching the reference regardless of --scale,
    /root/reference/fsrgan.py:213-214)."""

    gf: int = 32
    n_residual_blocks: int = 6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = FSRGANBody(self.gf, self.n_residual_blocks, dtype=self.dtype,
                       name="body")(x, train)
        return FSRGANTail(self.gf, dtype=self.dtype, name="tail")(h)
