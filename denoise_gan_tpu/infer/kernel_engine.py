"""Frame engine built around the fused Pallas tail kernel (ops/pallas/tail).

Geometry: tile width fixed at 124 (kernel lane geometry: 124 + conv halo =
exactly 128 lanes), col stride 120; tile HEIGHT is free (the kernel's band
loop), so it is chosen to keep the tile count <= 128 — XLA's conv throughput
cliffs ~1.6x above a batch of 128 (PERF.md r2).  1080p: 8x16 tiles of
139x124 (core 135x120).

Pipeline per frame (one jitted program):

  pad(edge, +2 pre-roll) -> extract_grid (rect) -> FSRGAN body (XLA, bf16)
  -> fused tail kernel (up1+up2+final conv+tanh+crop-stitch+u8, VMEM)
  -> raw (ny*CR, 4, nx, 120, 12) uint8 whose C-order bytes ARE the
     (H*4, W*4*3) flat HWC stream (flat_view() = zero-copy host flatten).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from denoise_gan_tpu.infer.engine import extract_grid
from denoise_gan_tpu.ops.pallas.tail import CORE, T, build_fused_tail, \
    build_fused_tail_u8


def plan_grid(height: int, width: int, brc: int = 45,
              max_tiles: int = 128) -> tuple[int, int, int]:
    """Pick (ny, nx, core_rows): col stride fixed at CORE=120; rows chosen
    so ny*nx <= max_tiles when possible and core_rows % brc == 0."""
    nx = -(-width // CORE)
    ny = max(1, max_tiles // nx)
    while True:
        core_rows = brc * (-(-height // (ny * brc)))
        if ny <= 1 or (ny - 1) * core_rows < height:
            return ny, nx, core_rows
        ny -= 1     # fewer rows still cover the frame; keep tiles minimal


def flat_view(out5: "np.ndarray | object", height: int, width: int,
              scale: int = 4):
    """Host-side zero-copy flatten of the kernel engine's 5D u8 output
    (ny*CR, 4, nx, CORE, 12) to (H*scale, W*scale*3) HWC bytes.

    The 5D array's C-order element sequence IS the flat byte stream (rows
    (r, eo) major, then (x, col, fo, c)), so this is a numpy view plus a
    crop; the row crop is free, the column crop is free when width is a
    multiple of CORE (e.g. 1920)."""
    import numpy as np
    arr = np.asarray(out5)
    cr4 = arr.shape[0] * 4
    flat = arr.reshape(cr4, arr.shape[2] * CORE * 12)
    return flat[:height * scale, :width * scale * 3]


def flat_to_hwc(out5, height: int, width: int, scale: int = 4):
    """Device-side (traceable) flatten of the 5D u8 output to
    (H*scale, W*scale, 3) f32 in [0,1] — the same byte mapping as
    :func:`flat_view`, but on device.  Costs a ~8 ms/frame relayout of the
    lane-padded (CORE, 12) minors (PERF.md r2), so keep it OFF the hot path
    (it exists for subsampled on-device scoring in the video CLI)."""
    cr4 = out5.shape[0] * 4
    flat = out5.reshape(cr4, out5.shape[2] * out5.shape[3] * out5.shape[4])
    flat = flat[:height * scale, :width * scale * 3]
    return (flat.reshape(height * scale, width * scale, 3)
            .astype(jnp.float32) / 255.0)


def build_kernel_engine(body_apply, tail_params, height: int, width: int,
                        brc: int = 45, prep: str = "conv",
                        out_uint8: bool = True, flat_channels: bool = True,
                        interpret: bool = False,
                        plan: tuple[int, int, int] | None = None,
                        tail_builders=None, jit_compile: bool = True,
                        q8_calib=None, bgr: bool = False,
                        qh8: bool = False, u8_input: bool = False):
    """body_apply: (N, TR, T, 3) [-1,1] -> (N, TR, T, 32) bf16 body features.
    Returns fn(frame01 (H, W, 3)) ->
    * out_uint8 (default): the kernel's raw (ny*CR, 4, nx, CORE, 12) uint8
      output, whose C-order bytes ARE the (H'*4, W'*4*3) flat HWC stream —
      use :func:`flat_view` for a zero-copy host flatten+crop.  Returning
      the 5D avoids an 8.3 ms/frame device relayout (PERF.md r2): the
      (120, 12) minors are (8,128)-tiled so a device-side reshape reads
      ~10.7x padded bytes, while the device->host transfer de-tiles for
      free either way.
    * else: (H*4, W*4, 3) f32 in [0,1].
    `plan` overrides the (ny, nx, core_rows) grid
    (tools/exp_grid_shapes.py)."""
    ny, nx, cr = plan or plan_grid(height, width, brc)
    m0 = 2                          # crop-stitch margins
    tr = cr + 4
    pad_h = (ny - 1) * cr + tr
    pad_w = (nx - 1) * CORE + T
    scale = 4
    u8_path = out_uint8 and flat_channels

    mk_canvas, mk_u8 = tail_builders or (build_fused_tail,
                                         build_fused_tail_u8)
    qkw = {} if q8_calib is None else {"q8_calib": q8_calib}
    if q8_calib is not None and qh8:
        # int8 h3 DMA + w8a8 up1 on top of the w8a8 tail (VERDICT r3 #4a/c)
        qkw["qh8"] = True
    if u8_path:
        # bgr: the kernel's u8 epilogue emits BGR byte order directly (a
        # free Seo column permutation) — what cv2's writer consumes; saves
        # a 95 MB/frame strided host flip in the video CLI at 1080p->4K
        fused = mk_u8(tail_params, ny, nx, brc=brc, core_rows=cr, prep=prep,
                      interpret=interpret, flat=False, bgr=bgr, **qkw)
    else:
        if bgr:
            raise ValueError("bgr=True requires the u8/flat kernel path "
                             "(out_uint8=True, flat_channels=True)")
        fused = mk_canvas(tail_params, ny, nx, brc=brc, core_rows=cr,
                          prep=prep, interpret=interpret, **qkw)

    if not jit_compile:
        # raw (untraced) fn, e.g. for wrapping in shard_map — the caller
        # jits (tests/test_parallel.py frame-DP over the virtual mesh)
        deco = lambda f: f
    elif u8_path and not interpret:
        # Pin the jit output to the row-major (default) layout: XLA's layout
        # assignment otherwise picks a permuted layout for the u8 root and
        # inserts a 2.3 ms/frame copy of the pallas output (PERF.md r2).
        from jax.experimental import layout as jlayout
        out_fmt = jlayout.Format(
            jlayout.Layout(major_to_minor=(0, 1, 2, 3, 4)),
            jax.sharding.SingleDeviceSharding(jax.devices()[0]))
        deco = functools.partial(jax.jit, out_shardings=out_fmt)
    else:
        deco = jax.jit

    @deco
    def run(frame01):
        if u8_input:
            # uint8 path (VERDICT r3 #4b): pad/extract move 1 byte/px (vs 2
            # at bf16) and the HOST ships the decoder's u8 frame verbatim
            # (4x fewer H2D bytes, no per-frame f32 conversion).  The
            # normalize affine runs in f32 per tile (exact), then bf16.
            x = jnp.pad(frame01, ((m0, pad_h - height - m0),
                                  (m0, pad_w - width - m0), (0, 0)),
                        mode="edge")
            tiles_u = extract_grid(x, ny, nx, (tr, T), (cr, CORE))
            tiles = (tiles_u.astype(jnp.float32) * (2.0 / 255.0)
                     - 1.0).astype(jnp.bfloat16)
        else:
            # bf16 BEFORE pad/extract: halves the input-stage traffic and is
            # numerically free — FSRGANBody casts tiles to bf16 at entry
            x = (frame01 * 2.0 - 1.0).astype(jnp.bfloat16)
            x = jnp.pad(x, ((m0, pad_h - height - m0),
                            (m0, pad_w - width - m0), (0, 0)), mode="edge")
            tiles = extract_grid(x, ny, nx, (tr, T), (cr, CORE))
        h = body_apply(tiles)
        if u8_path:
            return fused(h)                       # (ny*cr, 4, nx, 120, 12)
        canvas = fused(h)                         # (ny*cr, nx*120, 48)
        out01 = jnp.clip((canvas.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        from denoise_gan_tpu.ops.image import depth_to_space
        fine = depth_to_space(out01[None], scale)[0]
        fine = fine[:height * scale, :width * scale]
        if out_uint8:
            # honor the u8 request independently of flat_channels so the
            # contract matches build_frame_engine (ADVICE.md r2)
            return (fine * 255.0 + 0.5).astype(jnp.uint8)
        return fine

    return run


def _flip_stem_input_channels(body_params, stem_key: str):
    """Permute the stem conv's INPUT channels RGB<->BGR — a free host-side
    weight edit that lets the engine take the video decoder's BGR frames
    verbatim (no per-frame host flip, VERDICT r3 #4b)."""
    p = dict(body_params)
    k = dict(p[stem_key])
    k["kernel"] = jnp.asarray(k["kernel"])[:, :, ::-1, :]
    p[stem_key] = k
    return p


def build_fsrgan_kernel_engine(params, batch_stats, height: int, width: int,
                               brc: int | None = None, prep: str = "conv",
                               interpret: bool = False,
                               plan: tuple[int, int, int] | None = None,
                               q8_calib_frame=None, qh8: bool = False,
                               bgr_input: bool = False, **kw):
    """Convenience: wire the FSRGAN body (XLA, bf16) to the fused tail.

    q8_calib_frame: an (H, W, 3) [0,1] sample frame — runs the body once on
    its tiles and builds the w8a8 (int8 up2/final) tail calibrated on the
    resulting activations (VERDICT r2 #1).

    brc=None picks the measured-optimal band size per tail mode
    (tools/exp_q8_brc_sweep.py: w8a8 27.04 fps at brc=27 vs 26.86 at the
    bf16-tuned 45)."""
    from denoise_gan_tpu.models.fsrgan import FSRGANBody

    if brc is None:
        brc = 27 if q8_calib_frame is not None else 45

    body = FSRGANBody(dtype=jnp.bfloat16)
    body_p = params["body"]
    if bgr_input:
        body_p = _flip_stem_input_channels(body_p, "Conv_0")
    body_s = (batch_stats or {}).get("body", {})

    def body_apply(tiles):
        return body.apply({"params": body_p, "batch_stats": body_s},
                          tiles, train=False)

    kw2 = dict(kw)
    if q8_calib_frame is not None:
        # calibration frames are RGB [0,1]; flip to match a bgr_input stem
        calib = q8_calib_frame
        if bgr_input:
            calib = ([f[..., ::-1] for f in calib]
                     if isinstance(calib, (list, tuple)) else calib[..., ::-1])
        kw2["q8_calib"] = _body_sample(body_apply, calib, height, width, brc)
        kw2["qh8"] = qh8
    return build_kernel_engine(body_apply, params["tail"], height, width,
                               brc=brc, prep=prep, interpret=interpret,
                               plan=plan, **kw2)


def _body_sample(body_apply, frames01, height, width, brc,
                 max_tiles: int = 16):
    """Body activations on sample frames' leading tiles — the calibration
    input for the w8a8 tail.  `frames01` may be one (H, W, 3) frame or a
    list of them (frames spread across a clip calibrate the static int8
    activation scales against scene changes, ADVICE r3); tiles are split
    evenly across frames up to `max_tiles` total."""
    if not isinstance(frames01, (list, tuple)):
        frames01 = [frames01]
    ny, nx, cr = plan_grid(height, width, brc)
    m0, tr = 2, cr + 4
    pad_h = (ny - 1) * cr + tr
    pad_w = (nx - 1) * CORE + T
    per = max(1, max_tiles // len(frames01))
    run = jax.jit(body_apply)
    samples = []
    for frame01 in frames01:
        x = (jnp.asarray(frame01) * 2.0 - 1.0).astype(jnp.bfloat16)
        x = jnp.pad(x, ((m0, pad_h - height - m0),
                        (m0, pad_w - width - m0), (0, 0)), mode="edge")
        tiles = extract_grid(x, ny, nx, (tr, T), (cr, CORE))[:per]
        samples.append(run(tiles))
    return jnp.concatenate(samples) if len(samples) > 1 else samples[0]


def build_srgan_kernel_engine(params, batch_stats, height: int, width: int,
                              brc: int | None = None, prep: str = "conv",
                              interpret: bool = False,
                              plan: tuple[int, int, int] | None = None,
                              q8_calib_frame=None, qh8: bool = False,
                              bgr_input: bool = False, **kw):
    """SRGAN 4x variant: 16-resblock body (XLA, bf16) + the CIN=64 fused
    tail kernel (ops/pallas/tail_srgan.py).  Same geometry and output
    contracts (and q8_calib_frame option) as the FSRGAN engine.

    brc=None picks the measured-optimal band size per tail mode
    (tools/exp_q8_brc_sweep.py: w8a8 13.94 fps at brc=27 vs 13.59 at the
    bf16-tuned 15)."""
    from denoise_gan_tpu.models.srgan import SRGANBody
    from denoise_gan_tpu.ops.pallas import tail_srgan

    if brc is None:
        brc = 27 if q8_calib_frame is not None else 15

    body = SRGANBody(dtype=jnp.bfloat16)
    body_p = params["body"]
    if bgr_input:
        body_p = _flip_stem_input_channels(body_p, "Conv_0")
    body_s = (batch_stats or {}).get("body", {})

    def body_apply(tiles):
        return body.apply({"params": body_p, "batch_stats": body_s},
                          tiles, train=False)

    kw2 = dict(kw)
    if q8_calib_frame is not None:
        calib = q8_calib_frame
        if bgr_input:
            calib = ([f[..., ::-1] for f in calib]
                     if isinstance(calib, (list, tuple)) else calib[..., ::-1])
        kw2["q8_calib"] = _body_sample(body_apply, calib, height, width, brc)
        kw2["qh8"] = qh8
    return build_kernel_engine(
        body_apply, params["tail"], height, width, brc=brc, prep=prep,
        interpret=interpret, plan=plan,
        tail_builders=(tail_srgan.build_fused_tail64,
                       tail_srgan.build_fused_tail64_u8), **kw2)
