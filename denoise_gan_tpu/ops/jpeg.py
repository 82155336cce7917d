"""On-device JPEG compression-artifact simulation (the training noise model).

The reference's noise model is a real JPEG encode/decode round trip on the
host (`tf.image.adjust_jpeg_quality`, /root/reference/dataloader.py:127-140).
JPEG's entropy coding stage is lossless, so the *artifacts* are produced
entirely by: RGB->YCbCr, 4:2:0 chroma subsampling, 8x8 block DCT, quantization
with quality-scaled Annex-K tables, dequantization, IDCT, chroma upsampling,
YCbCr->RGB.  All of those are dense tensor ops — so here the whole round trip
runs **on the TPU**, batched and jit-fused into the training step, instead of
per-image on host CPU threads.

Numerics follow libjpeg conventions (the backend of tf.image.adjust_jpeg_quality):
* quality -> table scaling per jpeg_quality_scaling(),
* encoder chroma downsample = 2x2 box average (h2v2_downsample),
* decoder chroma upsample = "fancy" triangular filter, which equals
  half-pixel-aligned bilinear (jax.image.resize 'linear', antialias=False).
Differences vs libjpeg: float DCT instead of the scaled integer DCT, and
round-half-even quantization — both sub-ULP-of-uint8 effects in practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# JPEG Annex K base quantization tables.
LUMA_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

CHROMA_BASE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: coeffs = D @ block @ D.T."""
    d = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            d[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d.astype(np.float32)


_DCT = jnp.asarray(_dct_matrix())


def quality_to_tables(quality) -> tuple[jax.Array, jax.Array]:
    """libjpeg jpeg_quality_scaling(): traceable so random-quality
    augmentation (/root/reference/dataloader.py:142-159) can jit."""
    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    scale = scale[..., None, None]  # broadcast over the 8x8 table
    def scale_tbl(base):
        return jnp.clip(jnp.floor((jnp.asarray(base) * scale + 50.0) / 100.0),
                        1.0, 255.0)
    return scale_tbl(LUMA_BASE), scale_tbl(CHROMA_BASE)


def rgb_to_ycbcr(rgb255: jax.Array) -> jax.Array:
    """JFIF full-range RGB->YCbCr on [0,255] values, channels last."""
    r, g, b = rgb255[..., 0], rgb255[..., 1], rgb255[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: jax.Array) -> jax.Array:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def _blockwise_quantize(plane: jax.Array, table: jax.Array) -> jax.Array:
    """8x8 block DCT -> quantize -> dequantize -> IDCT on a (..., H, W) plane.

    The DCTs are expressed as small matmuls; XLA maps the batched einsum onto
    the MXU and fuses the elementwise quantization between them.
    """
    h, w = plane.shape[-2:]
    blocks = plane.reshape(*plane.shape[:-2], h // 8, 8, w // 8, 8)
    blocks = jnp.swapaxes(blocks, -3, -2)            # (..., h/8, w/8, 8, 8)
    blocks = blocks - 128.0
    coeff = jnp.einsum("ua,...ab,vb->...uv", _DCT, blocks, _DCT)
    coeff = jnp.round(coeff / table) * table
    out = jnp.einsum("ua,...uv,vb->...ab", _DCT, coeff, _DCT)
    out = out + 128.0
    out = jnp.swapaxes(out, -3, -2)
    return out.reshape(*plane.shape[:-2], h, w)


def _downsample2x(plane: jax.Array) -> jax.Array:
    """Encoder chroma downsample: 2x2 box average (libjpeg h2v2_downsample)."""
    h, w = plane.shape[-2:]
    p = plane.reshape(*plane.shape[:-2], h // 2, 2, w // 2, 2)
    return p.mean(axis=(-3, -1))


def _upsample2x(plane: jax.Array) -> jax.Array:
    """Decoder chroma upsample: libjpeg "fancy" triangular filter ==
    half-pixel-aligned bilinear."""
    out_shape = (*plane.shape[:-2], plane.shape[-2] * 2, plane.shape[-1] * 2)
    return jax.image.resize(plane, out_shape, method="linear", antialias=False)


@functools.partial(jax.jit, static_argnames=("chroma_subsample",))
def jpeg_roundtrip(rgb01: jax.Array, quality, chroma_subsample: bool = True
                   ) -> jax.Array:
    """JPEG-compress-then-decompress a [0,1] RGB image (HWC or NHWC).

    TPU-native equivalent of tf.image.adjust_jpeg_quality
    (/root/reference/dataloader.py:138).  `quality` may be a Python int or a
    traced scalar/per-image vector (enables on-device random-quality
    augmentation).
    """
    squeeze = rgb01.ndim == 3
    if squeeze:
        rgb01 = rgb01[None]
    n, h, w, _ = rgb01.shape

    # pad to a multiple of 16 with edge replication (JPEG MCU for 4:2:0)
    mult = 16 if chroma_subsample else 8
    ph = (-h) % mult
    pw = (-w) % mult
    x = jnp.pad(rgb01, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

    luma_t, chroma_t = quality_to_tables(quality)
    # per-image quality vectors broadcast over block dims
    if luma_t.ndim == 3:
        luma_t = luma_t[:, None, None]
        chroma_t = chroma_t[:, None, None]

    ycc = rgb_to_ycbcr(x * 255.0)
    y = _blockwise_quantize(ycc[..., 0], luma_t)
    if chroma_subsample:
        cb = _upsample2x(_blockwise_quantize(_downsample2x(ycc[..., 1]), chroma_t))
        cr = _upsample2x(_blockwise_quantize(_downsample2x(ycc[..., 2]), chroma_t))
    else:
        cb = _blockwise_quantize(ycc[..., 1], chroma_t)
        cr = _blockwise_quantize(ycc[..., 2], chroma_t)

    # decoder clamps each component to [0,255] before color conversion
    ycc_out = jnp.clip(jnp.stack([y, cb, cr], axis=-1), 0.0, 255.0)
    out = jnp.clip(ycbcr_to_rgb(ycc_out), 0.0, 255.0) / 255.0
    out = out[:, :h, :w, :]
    return out[0] if squeeze else out


def random_jpeg_quality(rgb01: jax.Array, rng: jax.Array,
                        min_quality: int = 25, max_quality: int = 75
                        ) -> jax.Array:
    """Per-image random-quality degradation, fully on device
    (reference's unused random_jpeg_quality, /root/reference/dataloader.py:142-159)."""
    n = rgb01.shape[0]
    q = jax.random.randint(rng, (n,), min_quality, max_quality + 1)
    return jpeg_roundtrip(rgb01, q.astype(jnp.float32))
