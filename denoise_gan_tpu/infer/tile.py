"""Overlap-tiled spatial decomposition for large-frame inference.

The reference runs whole padded 1080p+ frames through the generator one at a
time (/root/reference/infer_video.py:140-146) and carries dormant
non-overlapping space_to_depth tiling helpers (`im2patch`/`patch2im`,
/root/reference/infer_video.py:47-55).  This module is that embryo done
right: frames are decomposed into **overlapping** tiles (halo >= the model's
receptive-field margin), the generator runs batched over tiles (large,
static-shape batches that keep the MXU fed), and tiles are stitched with
linear feather blending in the overlap so no seams appear.  All steps are
jit-compatible (static tile grid per frame geometry).

This is the image-domain analog of sequence parallelism (SURVEY.md §5): the
tile batch can additionally be sharded over a device mesh for multi-chip
streaming.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def plan_positions(size: int, tile: int, overlap: int) -> list[int]:
    """Tile start offsets covering [0, size) with `overlap` pixels shared
    between neighbors; the last tile is clamped flush to the edge."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    n = math.ceil((size - tile) / stride) + 1
    return [min(i * stride, size - tile) for i in range(n)]


def plan_tiles(h: int, w: int, tile: int, overlap: int
               ) -> list[tuple[int, int]]:
    return [(y, x) for y in plan_positions(h, tile, overlap)
            for x in plan_positions(w, tile, overlap)]


def _feather(tile: int, scale: int, overlap: int) -> np.ndarray:
    """2-D blend weights: flat center, linear ramp across the overlap."""
    t = tile * scale
    o = max(overlap * scale, 1)
    ramp = np.minimum(np.arange(1, t + 1), o) / o
    w1 = np.minimum(ramp, ramp[::-1])
    return (w1[:, None] * w1[None, :]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("tile", "overlap"))
def extract_tiles(img: jax.Array, tile: int, overlap: int) -> jax.Array:
    """HWC image -> (N, tile, tile, C) overlapping tile batch.  The image is
    edge-padded up to `tile` per side if smaller."""
    h, w, c = img.shape
    ph, pw = max(tile - h, 0), max(tile - w, 0)
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        h, w = img.shape[:2]
    pos = plan_tiles(h, w, tile, overlap)
    tiles = [jax.lax.dynamic_slice(img, (y, x, 0), (tile, tile, c))
             for (y, x) in pos]
    return jnp.stack(tiles)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "tile", "overlap", "scale"))
def stitch_tiles(tiles: jax.Array, h: int, w: int, tile: int, overlap: int,
                 scale: int = 1) -> jax.Array:
    """(N, tile*scale, tile*scale, C) -> (h*scale, w*scale, C) with feather
    blending in the overlaps."""
    ph, pw = max(tile - h, 0), max(tile - w, 0)
    hh, ww = h + ph, w + pw
    pos = plan_tiles(hh, ww, tile, overlap)
    c = tiles.shape[-1]
    weight = jnp.asarray(_feather(tile, scale, overlap))[..., None]

    acc = jnp.zeros((hh * scale, ww * scale, c), jnp.float32)
    norm = jnp.zeros((hh * scale, ww * scale, 1), jnp.float32)
    for i, (y, x) in enumerate(pos):
        ys, xs = y * scale, x * scale
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(
                acc, (ys, xs, 0), (tile * scale, tile * scale, c))
            + tiles[i].astype(jnp.float32) * weight,
            (ys, xs, 0))
        norm = jax.lax.dynamic_update_slice(
            norm,
            jax.lax.dynamic_slice(norm, (ys, xs, 0),
                                  (tile * scale, tile * scale, 1)) + weight,
            (ys, xs, 0))
    out = acc / jnp.maximum(norm, 1e-8)
    return out[:h * scale, :w * scale, :]


def tiled_apply(fn, img: jax.Array, tile: int, overlap: int, scale: int,
                batch: int = 0) -> jax.Array:
    """Run `fn` (NHWC->NHWC, e.g. a jitted generator forward) over the tile
    batch and stitch.  `batch`>0 chunks the tile batch to bound memory."""
    h, w, _ = img.shape
    tiles = extract_tiles(img, tile, overlap)
    if batch and tiles.shape[0] > batch:
        outs = []
        n = tiles.shape[0]
        pad = (-n) % batch
        if pad:
            tiles = jnp.concatenate([tiles, tiles[:pad]], axis=0)
        for i in range(0, tiles.shape[0], batch):
            outs.append(fn(tiles[i:i + batch]))
        out_tiles = jnp.concatenate(outs, axis=0)[:n]
    else:
        out_tiles = fn(tiles)
    return stitch_tiles(out_tiles, h, w, tile, overlap, scale)
