"""Core NHWC image ops, all jit-safe and TPU-layout friendly.

TPU-first equivalents of the reference's TF image ops:
* ``depth_to_space``/``space_to_depth`` — pixel shuffle used by SRGAN/FSRGAN
  upsampling (/root/reference/srgan.py:145, /root/reference/fsrgan.py:188) and
  by the video tiler (/root/reference/infer_video.py:47-55).
* ``sobel_edges``/``high_pass_x_y``/``total_variation_map`` — the TensorBoard
  image diagnostics (/root/reference/train_srgan.py:44-59).
* ``total_variation`` — matches tf.image.total_variation (per-image sum of
  absolute differences) used in the losses (/root/reference/srgan.py:101).
* ``resize_bicubic`` — the dataloader's downscale (/root/reference/dataloader.py:121-123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def depth_to_space(x: jax.Array, block: int) -> jax.Array:
    """NHWC depth-to-space with TF channel ordering (input channel index is
    ``(dy*block + dx)*C_out + c``), matching tf.nn.depth_to_space."""
    return rearrange(x, "b h w (s1 s2 c) -> b (h s1) (w s2) c", s1=block, s2=block)


def space_to_depth(x: jax.Array, block: int) -> jax.Array:
    """Inverse of :func:`depth_to_space`, matching tf.nn.space_to_depth."""
    return rearrange(x, "b (h s1) (w s2) c -> b h w (s1 s2 c)", s1=block, s2=block)


def pixel_shuffle(x: jax.Array, upscale: int = 2) -> jax.Array:
    """Alias used by the generator upsample blocks."""
    return depth_to_space(x, upscale)


# --- gradient / variation diagnostics -------------------------------------

_SOBEL_Y = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]])
_SOBEL_X = _SOBEL_Y.T


def sobel_edges(image: jax.Array) -> jax.Array:
    """tf.image.sobel_edges: NHWC -> NHWC2 with [grad_y, grad_x] stacked on a
    trailing axis; REFLECT padding like TF."""
    n, h, w, c = image.shape
    pad = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # grouped-conv HWIO kernel (in/groups=1, out=2c), group-major [gy, gx]
    k = jnp.stack([_SOBEL_Y, _SOBEL_X], axis=-1)          # (3, 3, 2)
    k = jnp.tile(k[:, :, None, :], (1, 1, 1, c))          # (3, 3, 1, 2c)
    out = jax.lax.conv_general_dilated(
        pad.astype(jnp.float32),
        k.astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    # output channels are ordered (c0_gy, c0_gx, c1_gy, ...) -> (n,h,w,c,2)
    return out.reshape(n, h, w, c, 2)


def sobel_variation(image: jax.Array) -> jax.Array:
    """Sobel gradient magnitude of a [-1,1] image
    (/root/reference/train_srgan.py:44-49)."""
    renormed = jnp.clip((image + 1.0) / 2.0, 0.0, 1.0)
    sob = sobel_edges(renormed)
    dy = sob[..., 0] / 4.0
    dx = sob[..., 1] / 4.0
    return jnp.sqrt(jnp.square(dx) + jnp.square(dy))


def high_pass_x_y(image: jax.Array) -> tuple[jax.Array, jax.Array]:
    """First differences, cropped to a common shape
    (/root/reference/train_srgan.py:51-54)."""
    x_var = image[:, :, 1:, :] - image[:, :, :-1, :]
    y_var = image[:, 1:, :, :] - image[:, :-1, :, :]
    return x_var[:, :-1, :, :], y_var[:, :, :-1, :]


def total_variation_map(image: jax.Array) -> jax.Array:
    """|dx| + |dy| image panel (/root/reference/train_srgan.py:56-59)."""
    dx, dy = high_pass_x_y(image)
    return jnp.abs(dx) + jnp.abs(dy)


def total_variation(image: jax.Array) -> jax.Array:
    """tf.image.total_variation: per-image sum over H, W, C of absolute
    differences; returns shape (N,)."""
    dh = jnp.abs(image[:, 1:, :, :] - image[:, :-1, :, :])
    dw = jnp.abs(image[:, :, 1:, :] - image[:, :, :-1, :])
    return jnp.sum(dh, axis=(1, 2, 3)) + jnp.sum(dw, axis=(1, 2, 3))


# --- resize ----------------------------------------------------------------

def resize_bicubic(image: jax.Array, height: int, width: int,
                   antialias: bool = False) -> jax.Array:
    """Bicubic resize (NHWC or HWC). jax.image 'cubic' is the same Keys cubic
    kernel as tf.image.resize(method='bicubic'); TF2's default is
    antialias=False (no kernel widening on downscale), and the reference's
    degradation uses that default (/root/reference/dataloader.py:121-123), so
    False is the parity default here (tests/test_ops_image.py)."""
    if image.ndim == 3:
        shape = (height, width, image.shape[-1])
    else:
        shape = (image.shape[0], height, width, image.shape[-1])
    return jax.image.resize(image, shape, method="cubic", antialias=antialias)


def resize_with_crop_or_pad(image: jax.Array, th: int, tw: int) -> jax.Array:
    """tf.image.resize_with_crop_or_pad for NHWC/HWC: center crop or zero pad
    to (th, tw) (/root/reference/infer_video.py:140)."""
    sq = image.ndim == 3
    if sq:
        image = image[None]
    n, h, w, c = image.shape
    # crop
    if h > th:
        off = (h - th) // 2
        image = image[:, off:off + th, :, :]
    if w > tw:
        off = (w - tw) // 2
        image = image[:, :, off:off + tw, :]
    n, h, w, c = image.shape
    # pad
    ph, pw = th - h, tw - w
    if ph > 0 or pw > 0:
        image = jnp.pad(
            image,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        )
    return image[0] if sq else image


def renorm(image: jax.Array) -> jax.Array:
    """[-1,1] -> [0,1] clipped (/root/reference/train_srgan.py:30-31)."""
    return jnp.clip((image + 1.0) / 2.0, 0.0, 1.0)


def autoscale(image: jax.Array, scale: float = 1.0) -> jax.Array:
    """min/max rescale (/root/reference/train_srgan.py:33-34)."""
    lo = jnp.min(image)
    return scale * (image - lo) / (jnp.max(image) - lo + 1e-12)


def to_uint8(image: jax.Array, norm: bool = True) -> jax.Array:
    """[-1,1] float -> uint8 panel (/root/reference/train_srgan.py:36-42)."""
    image = renorm(image) if norm else autoscale(image)
    return (255.0 * image).astype(jnp.uint8)


# --- non-overlapping tiling (reference parity helpers) ----------------------
# The production inference path uses the overlap-tiled infer/tile.py; these
# mirror the reference's dormant space_to_depth helpers exactly
# (/root/reference/infer_video.py:47-55).

def im2patch(img: jax.Array, crop: int = 256) -> jax.Array:
    """NHWC (1, H, W, C) -> (H*W/crop^2, crop, crop, C), non-overlapping."""
    c = img.shape[-1]
    return space_to_depth(img, crop).reshape(-1, crop, crop, c)


def patch2im(imgs: jax.Array, patch_shape=(4, 4)) -> jax.Array:
    """Inverse of im2patch for a (N, crop, crop, C) batch laid out row-major
    over a patch_shape grid."""
    crop = imgs.shape[1]
    return depth_to_space(
        imgs.reshape(1, patch_shape[0], patch_shape[1], -1), crop)


def laplacian(image: jax.Array) -> jax.Array:
    """3x3 Laplacian filter per channel (cv2.Laplacian CV_32F equivalent,
    /root/reference/infer_video.py:57-63), REPLICATE border."""
    sq = image.ndim == 3
    if sq:
        image = image[None]
    n, h, w, c = image.shape
    k2 = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    k = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
    pad = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = jax.lax.conv_general_dilated(
        pad.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return out[0] if sq else out
