"""On-device degradation: the training-pair synthesis, jit-fused into the step.

The reference does this per-image on host CPU threads in tf.data
(/root/reference/dataloader.py:188-229): bicubic downscale by `scale`
-> JPEG re-compression at `jpeg_quality` -> normalize to [-1, 1].  Here the
host only supplies batched HR crops in [0, 1]; everything else is batched
XLA on device, fused into the same program as the GAN step — zero extra
host<->device traffic and no Python in the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from denoise_gan_tpu.ops.image import resize_bicubic
from denoise_gan_tpu.ops.jpeg import jpeg_roundtrip


def degrade_pair(hr01: jax.Array, scale: int, jpeg_quality,
                 rng: jax.Array | None = None,
                 random_quality: bool = False) -> tuple[jax.Array, jax.Array]:
    """HR [0,1] NHWC batch -> (degraded input, clean target), both in [-1,1].

    Mirrors the reference pipeline order: scale_image (bicubic downscale of
    the clean target, /root/reference/dataloader.py:110-125) ->
    adjust_jpeg_quality (:127-140) -> normalize (:161-177).
    """
    hr01 = hr01.astype(jnp.float32)
    n, h, w, _ = hr01.shape

    if scale > 1:
        lr01 = resize_bicubic(hr01, h // scale, w // scale)
        lr01 = jnp.clip(lr01, 0.0, 1.0)
    else:
        lr01 = hr01  # same-size resize is the identity (scale=1 denoise task)

    if random_quality and rng is not None:
        q = jax.random.randint(rng, (n,), 25, 76).astype(jnp.float32)
        lr01 = jpeg_roundtrip(lr01, q)
    else:
        lr01 = jpeg_roundtrip(lr01, jpeg_quality)

    return lr01 * 2.0 - 1.0, hr01 * 2.0 - 1.0
