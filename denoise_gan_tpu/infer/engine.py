"""Whole-frame streaming inference engine: extract -> generator (coarse
tail) -> phase-space overlap-add stitch -> single depth_to_space.

Two TPU-specific design points:

1. **Phase-space stitching.**  Blending 4x-upscaled tiles at fine resolution
   means updates on (H*4, W*4, 3) canvases — 3-channel tensors at huge
   spatial sizes, which XLA lays out with up to 128x lane padding (measured:
   a 12MB slice allocated 1.5GB).  Instead the generator's coarse tail
   (infer/fast.py) stops *before* its final depth_to_space, tiles are blended
   on an (H, W, 3*scale^2) canvas — 48 channels, lane-friendly — and the fine
   image is produced by one depth_to_space at the end.

2. **Regular-grid overlap-add.**  Sequential dynamic_update_slice stitching
   copies the whole canvas per tile (measured 69ms/frame).  The frame is
   edge-padded so tiles form an exact (ny, nx) grid with stride = tile -
   overlap; since overlap < stride every output pixel is covered by at most
   2 tiles per axis, so the blend is two shifted adds per axis — pure static
   reshape/pad/add, ~3 passes over the canvas.

Feather weights are per phase channel, so the result equals fine-space
feathering exactly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.infer.tile import _feather
from denoise_gan_tpu.ops.image import depth_to_space


def _phase_feather(tile: int, scale: int, overlap: int, c: int) -> np.ndarray:
    """(tile, tile, c*scale^2) feather weights: the fine-space feather
    rearranged into phase channels (channel (e*scale+f)*c + o receives
    w_fine(scale*i+e, scale*j+f))."""
    fine = _feather(tile, scale, overlap)                 # (tile*s, tile*s)
    t, s = tile, scale
    w = fine.reshape(t, s, t, s).transpose(0, 2, 1, 3).reshape(t, t, s * s)
    return np.repeat(w, c, axis=-1)                       # phase-major, c fastest


def _grid(size: int, tile: int, stride: int) -> int:
    """Number of grid cells covering `size` (after padding)."""
    if size <= tile:
        return 1
    return math.ceil((size - tile) / stride) + 1


def overlap_add(tiles: jax.Array, ny: int, nx: int, tile: int, stride: int
                ) -> jax.Array:
    """(ny*nx, t, t, C) weighted tiles on a regular stride grid ->
    (ny*stride+ov, nx*stride+ov, C) canvas, ov = t - stride."""
    t = tile
    ov = t - stride
    c = tiles.shape[-1]
    x = tiles.reshape(ny, nx, t, t, c)

    # rows: head [0:stride] + previous tile's tail [stride:] shifted one cell
    head = x[:, :, :stride]
    tail = x[:, :, stride:]                              # (ny, nx, ov, t, c)
    tail_shift = jnp.pad(tail, ((1, 0), (0, 0), (0, stride - ov),
                                (0, 0), (0, 0)))[:ny]
    rows = head + tail_shift                             # (ny, nx, stride, t, c)
    rows = rows.transpose(0, 2, 1, 3, 4).reshape(ny * stride, nx, t, c)
    last = tail[-1].transpose(1, 0, 2, 3)                # (ov, nx, t, c)
    rows = jnp.concatenate([rows, last], axis=0)         # (H', nx, t, c)

    # cols: same along the tile-x axis
    head = rows[:, :, :stride]
    tail = rows[:, :, stride:]                           # (H', nx, ov, c)
    tail_shift = jnp.pad(tail, ((0, 0), (1, 0), (0, stride - ov),
                                (0, 0)))[:, :nx]
    cols = head + tail_shift                             # (H', nx, stride, c)
    cols = cols.reshape(rows.shape[0], nx * stride, c)
    lastc = tail[:, -1]                                  # (H', ov, c)
    return jnp.concatenate([cols, lastc], axis=1)        # (H', W', c)


def crop_stitch(tiles: jax.Array, ny: int, nx: int, tile: int, stride: int
                ) -> jax.Array:
    """Hard-cut stitching: each tile contributes its central stride x stride
    cell (overlap/2 margins cropped) — one slice+transpose+reshape pass over
    the tile batch instead of the feathered overlap-add's pad/concat dance.

    Requires the frame to be edge-padded by overlap/2 on top/left so core
    cells tile the output exactly (build_frame_engine stitch='crop' does
    this).  Near seams this picks the better-converged tile instead of
    blending two approximations; measured against the exact whole-frame
    output it is as close as feathering (PERF.md r2) and ~5x cheaper."""
    m0 = (tile - stride) // 2
    c = tiles.shape[-1]
    x = tiles.reshape(ny, nx, tile, tile, c)
    core = x[:, :, m0:m0 + stride, m0:m0 + stride, :]
    return core.transpose(0, 2, 1, 3, 4).reshape(ny * stride, nx * stride, c)


def extract_grid(frame: jax.Array, ny: int, nx: int, tile, stride
                 ) -> jax.Array:
    """(Hp, Wp, C) padded frame -> (ny*nx, ty, tx, C) regular-grid tiles.

    Structured inverse of :func:`overlap_add`: since overlap = tile - stride
    < stride, each tile is its stride-grid cell plus the first `ov` rows/cols
    of the next cell — two shifted reshapes per axis instead of ny*nx
    dynamic slices.  `tile`/`stride` may be (row, col) tuples for
    rectangular tiles (the fused-tail kernel engine uses tall tiles to keep
    the body batch <= 128, PERF.md r2)."""
    ty, tx = (tile, tile) if isinstance(tile, int) else tile
    sy, sx = (stride, stride) if isinstance(stride, int) else stride
    ovy, ovx = ty - sy, tx - sx
    hp, wp, c = frame.shape

    # rows: (Hp, Wp, C) -> (ny, ty, Wp, C)
    head = frame[:ny * sy].reshape(ny, sy, wp, c)
    shifted = jnp.pad(frame[sy:], ((0, sy), (0, 0), (0, 0)))
    tail = shifted[:ny * sy].reshape(ny, sy, wp, c)[:, :ovy]
    rows = jnp.concatenate([head, tail], axis=1)        # (ny, ty, Wp, C)

    # cols: (ny, ty, Wp, C) -> (ny, ty, nx, tx, C)
    head = rows[:, :, :nx * sx].reshape(ny, ty, nx, sx, c)
    shifted = jnp.pad(rows[:, :, sx:], ((0, 0), (0, 0), (0, sx),
                                        (0, 0)))
    tail = shifted[:, :, :nx * sx].reshape(ny, ty, nx, sx, c)[..., :ovx, :]
    tiles = jnp.concatenate([head, tail], axis=3)       # (ny, ty, nx, tx, C)
    return tiles.transpose(0, 2, 1, 3, 4).reshape(ny * nx, ty, tx, c)


def build_frame_engine(forward_coarse, height: int, width: int, scale: int,
                       tile: int = 256, overlap: int = 16,
                       channels: int = 3, frames_per_call: int = 1,
                       out_uint8: bool = False, flat_channels: bool = False,
                       acc_dtype=jnp.float32, mesh=None,
                       stitch: str = "feather", bgr: bool = False):
    """Build a jitted frame01 (H, W, 3) -> out (H*scale, W*scale, 3) fn.

    `forward_coarse`: (N, tile, tile, 3) [-1,1] -> (N, tile, tile,
    channels*scale^2) phase-channel output in [-1,1] (e.g. the fast tail with
    final_d2s=False).  scale == 1 works too (plain feather stitching).

    frames_per_call > 1 returns a fn over (F, H, W, 3) batches — one device
    dispatch per F frames (throughput mode for streaming video).
    out_uint8 returns uint8 in [0, 255] (quarters the output traffic).
    flat_channels (with out_uint8 and scale>1) returns (H*s, W*s*3) — the
    SAME bytes as row-major HWC, host-reshapeable for free.  A 4K tensor
    with a 3-channel minor dim pays up to 42x lane padding on TPU; the 2D
    layout makes the final depth_to_space ~23 ms/frame cheaper (PERF.md).

    tile == 0 selects WHOLE-FRAME mode: the body+coarse-tail run on the full
    padded coarse canvas in one shot — no extract/feather/overlap-add at all
    (exact inference, no tile-seam approximation).  Activations stay coarse
    (channels*scale^2 lanes) so HBM fits comfortably where the naive
    fine-space whole-frame path OOM'd (PERF.md round 1).

    mesh: a jax.sharding.Mesh for multi-chip inference — the TILE BATCH is
    sharded over the 'data' axis, so each chip runs the generator on its own
    tiles and GSPMD gathers them for the stitch (the frame-level analog of
    the reference's absent data parallelism, SURVEY.md §2 C19)."""
    if bgr and scale != 1:
        raise ValueError("bgr=True supports scale==1 engines only (the "
                         "scale>1 phase-channel layout needs the kernel "
                         "engines' Seo permutation instead)")
    whole = tile <= 0
    crop = stitch == "crop" and not whole
    m0 = (overlap // 2) if crop else 0
    if whole:
        # pad to sublane-friendly multiples; no overlap machinery
        tile = overlap = 0
        stride = 1
        ny = nx = 1
        pad_h = -(-height // 8) * 8
        pad_w = -(-width // 128) * 128
    elif crop:
        # top/left pre-pad of overlap/2 so tile CORE cells land exactly on
        # real pixels (crop_stitch)
        stride = tile - overlap
        ny = -(-height // stride)
        nx = -(-width // stride)
        pad_h = (ny - 1) * stride + tile
        pad_w = (nx - 1) * stride + tile
    else:
        stride = tile - overlap
        ny = _grid(height, tile, stride)
        nx = _grid(width, tile, stride)
        pad_h = (ny - 1) * stride + tile
        pad_w = (nx - 1) * stride + tile
    cc = channels * scale * scale

    if whole or crop:
        weight = inv_norm = None
    else:
        weight = jnp.asarray(_phase_feather(tile, scale, overlap, channels),
                             acc_dtype)
        inv_norm = jax.jit(lambda: (1.0 / jnp.maximum(overlap_add(
            jnp.broadcast_to(weight.astype(jnp.float32),
                             (ny * nx, tile, tile, cc)),
            ny, nx, tile, stride), 1e-8)).astype(acc_dtype))()

    def one_frame(frame01, inv_norm):
        x = frame01 * 2.0 - 1.0
        x = jnp.pad(x, ((m0, pad_h - height - m0),
                        (m0, pad_w - width - m0), (0, 0)),
                    mode="edge")
        if whole:
            acc = forward_coarse(x[None])[0]             # (Hp, Wp, cc)
        else:
            tiles = extract_grid(x, ny, nx, tile, stride)
            if mesh is not None:
                from denoise_gan_tpu.parallel.mesh import DATA_AXIS
                from jax.sharding import NamedSharding, PartitionSpec as P
                shard = NamedSharding(mesh, P(DATA_AXIS))
                tiles = jax.lax.with_sharding_constraint(tiles, shard)
            out = forward_coarse(tiles)                  # (N, t, t, cc)
            if mesh is not None:
                out = jax.lax.with_sharding_constraint(out, shard)
            if crop:
                acc = crop_stitch(out.astype(acc_dtype), ny, nx, tile, stride)
            else:
                acc = overlap_add(out.astype(acc_dtype) * weight,
                                  ny, nx, tile, stride)
                acc = acc * inv_norm
        out01 = jnp.clip((acc.astype(acc_dtype) + 1.0) / 2.0, 0.0, 1.0)
        if bgr:
            # scale==1 only (guarded below): plain HWC channels — emit BGR
            # on device so the video writer needs no host flip
            out01 = out01[..., ::-1]
        if out_uint8:
            out01 = (out01 * 255.0 + 0.5).astype(jnp.uint8)
        if scale > 1:
            if out_uint8 and flat_channels:
                hc, wc = out01.shape[:2]
                cs = channels * scale
                flat = out01.reshape(hc, wc, scale, cs)
                flat = flat.transpose(0, 2, 1, 3).reshape(hc * scale, wc * cs)
                return flat[:height * scale, :width * scale * channels]
            out01 = depth_to_space(out01[None], scale)[0]
        return out01[:height * scale, :width * scale]

    if frames_per_call == 1:
        run = jax.jit(one_frame)
        return functools.partial(run, inv_norm=inv_norm)

    @jax.jit
    def run_batch(frames01, inv_norm):
        # sequential per frame inside one dispatch: amortizes host->device
        # round trips without multiplying peak activation memory
        return jax.lax.map(lambda f: one_frame(f, inv_norm), frames01)

    return functools.partial(run_batch, inv_norm=inv_norm)
