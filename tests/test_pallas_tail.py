"""Fused Pallas tail kernel vs the plain FSRGANTail module.

The kernel (ops/pallas/tail.py) must reproduce the plain per-tile tail on
every CORE pixel (crop-stitch geometry).  Runs in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.models.fsrgan import FSRGANTail
from denoise_gan_tpu.ops.image import depth_to_space
from denoise_gan_tpu.ops.pallas.tail import (
    CORE, T, build_fused_tail, build_fused_tail_u8,
)


@pytest.fixture(scope="module")
def tail_setup():
    tail = FSRGANTail()
    h0 = jnp.zeros((1, T, T, 32), jnp.float32)
    params = tail.init(jax.random.key(0), h0)["params"]
    return tail, params


def _plain_core(tail, params, h_tiles, ny, nx):
    """Reference: plain tail per tile -> fine output -> core crop-stitch."""
    fine = tail.apply({"params": params}, h_tiles)      # (N, 4T, 4T, 3)
    n, fh, fw, c = fine.shape
    m0 = 2 * 4
    core = fine[:, m0:m0 + CORE * 4, m0:m0 + CORE * 4, :]
    core = core.reshape(ny, nx, CORE * 4, CORE * 4, c)
    return core.transpose(0, 2, 1, 3, 4).reshape(ny * CORE * 4,
                                                 nx * CORE * 4, c)


@pytest.mark.parametrize("ny,nx,brc", [(1, 1, 12), (1, 2, 24)])
def test_fused_tail_matches_plain(tail_setup, rng, ny, nx, brc):
    tail, params = tail_setup
    h = jnp.asarray(rng.standard_normal((ny * nx, T, T, 32)) * 0.5,
                    jnp.float32)

    fused = build_fused_tail(params, ny, nx, brc=brc, interpret=True)
    got48 = fused(h.astype(jnp.bfloat16))               # (nyC, nxC, 48)
    got = np.asarray(depth_to_space(
        got48.astype(jnp.float32)[None], 4)[0])

    want = np.asarray(_plain_core(tail, params, h, ny, nx))
    # bf16 matmuls vs f32 convs: tolerance at bf16 resolution of tanh range
    np.testing.assert_allclose(got, want, atol=3e-2)
    assert np.abs(got - want).mean() < 4e-3


def test_kernel_engine_matches_plain_generator(tail_setup, rng):
    """Full kernel engine (pad/extract + plain body + fused tail + u8 flat)
    vs the plain FSRGANGenerator run per-tile and crop-stitched."""
    import jax

    from denoise_gan_tpu.infer.kernel_engine import build_fsrgan_kernel_engine
    from denoise_gan_tpu.models import build_models

    H, W = 150, 170                      # 2x2 tile grid, uneven crop
    bundle = build_models("fsrgan", scale=4)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, T, T, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    frame01 = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    eng = build_fsrgan_kernel_engine(params, stats, H, W, brc=24,
                                     interpret=True)
    out5 = eng(frame01)
    assert out5.ndim == 5                   # raw kernel output (PERF.md r2)
    from denoise_gan_tpu.infer.kernel_engine import flat_view
    got = np.ascontiguousarray(flat_view(out5, H, W))
    assert got.shape == (H * 4, W * 4 * 3)

    # reference: plain generator on the engine's own (rectangular) tiles,
    # crop-stitched
    from denoise_gan_tpu.infer.engine import extract_grid
    from denoise_gan_tpu.infer.kernel_engine import plan_grid

    ny, nx, cr = plan_grid(H, W, brc=24)
    tr = cr + 4
    pad_h, pad_w = (ny - 1) * cr + tr, (nx - 1) * CORE + T
    x = jnp.pad(frame01 * 2 - 1, ((2, pad_h - H - 2),
                                  (2, pad_w - W - 2), (0, 0)), mode="edge")
    tiles = extract_grid(x, ny, nx, (tr, T), (cr, CORE))
    fine = bundle.generator.apply(
        {"params": params, "batch_stats": stats}, tiles, train=False)
    m0 = 8
    core = fine[:, m0:m0 + cr * 4, m0:m0 + CORE * 4, :]
    core = core.reshape(ny, nx, cr * 4, CORE * 4, 3)
    canvas = core.transpose(0, 2, 1, 3, 4).reshape(ny * cr * 4,
                                                   nx * CORE * 4, 3)
    want01 = np.clip((np.asarray(canvas[:H * 4, :W * 4]) + 1) / 2, 0, 1)
    want = (want01 * 255.0 + 0.5).astype(np.uint8)
    diff = np.abs(got.reshape(H * 4, W * 4, 3).astype(np.int32)
                  - want.astype(np.int32))
    # bf16 kernel vs f32 module: allow 1 u8 level almost everywhere
    assert diff.max() <= 3
    assert (diff > 1).mean() < 0.01


def test_kernel_engine_u8_bgr_input_matches_f32_rgb(rng):
    """u8/BGR-input engine (VERDICT r3 #4b: the decoder's BGR u8 frame goes
    to the device verbatim — stem weights flipped, normalize on device) vs
    the f32 RGB engine on the same image: byte-near-identical output."""
    import jax

    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, flat_view)
    from denoise_gan_tpu.models import build_models

    H, W = 150, 170
    bundle = build_models("fsrgan", scale=4)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, T, T, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    frame_u8 = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    frame01 = jnp.asarray(frame_u8.astype(np.float32) / 255.0)
    frame_bgr = jnp.asarray(frame_u8[..., ::-1])

    base = build_fsrgan_kernel_engine(params, stats, H, W, brc=24,
                                      interpret=True)
    u8bgr = build_fsrgan_kernel_engine(params, stats, H, W, brc=24,
                                       interpret=True, u8_input=True,
                                       bgr_input=True)
    want = np.asarray(flat_view(base(frame01), H, W)).astype(np.int32)
    got = np.asarray(flat_view(u8bgr(frame_bgr), H, W)).astype(np.int32)
    diff = np.abs(got - want)
    # only input-affine rounding differs (u8*(2/255)-1 in f32 vs
    # (f32*2-1)->bf16): at most 1 u8 level on a tiny fraction
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.02


def test_fused_tail_q8_within_engine_envelope(tail_setup, rng):
    """w8a8 (int8 up2/final dots, VERDICT r2 #1) vs the bf16 kernel on the
    final u8 pixels: must stay inside the engine's accepted quality envelope
    (<=1 u8 level on the overwhelming majority, small tail of 2)."""
    tail, params = tail_setup
    ny, nx, brc, cr = 1, 2, 12, 24
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 32)) * 0.5,
                    jnp.bfloat16)

    base = build_fused_tail_u8(params, ny, nx, brc=brc, core_rows=cr,
                               interpret=True)
    q8 = build_fused_tail_u8(params, ny, nx, brc=brc, core_rows=cr,
                             interpret=True, q8_calib=h.astype(jnp.float32))
    got = np.asarray(q8(h)).astype(np.int32)
    want = np.asarray(base(h)).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 5e-3
    # 1-level flips rose ~0.23 -> ~0.28 with the 1.25x calibration headroom
    # margin (ADVICE r3; Q8_MARGIN) — the envelope guards are max<=2 + frac>1
    assert (diff > 0).mean() < 0.35


def test_fused_tail_qh8_within_engine_envelope(tail_setup, rng):
    """qh8 (int8 h3 DMA + w8a8 up1 on top of the w8a8 tail, VERDICT r3
    #4a/#4c) vs the bf16 kernel on the final u8 pixels: same acceptance
    envelope as the q8 test."""
    tail, params = tail_setup
    ny, nx, brc, cr = 1, 2, 12, 24
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 32)) * 0.5,
                    jnp.bfloat16)

    base = build_fused_tail_u8(params, ny, nx, brc=brc, core_rows=cr,
                               interpret=True)
    qh8 = build_fused_tail_u8(params, ny, nx, brc=brc, core_rows=cr,
                              interpret=True,
                              q8_calib=h.astype(jnp.float32), qh8=True)
    got = np.asarray(qh8(h)).astype(np.int32)
    want = np.asarray(base(h)).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 5e-3
    # int8 h adds ~+4pp of 1-level flips over plain q8 (0.28 -> 0.33)
    assert (diff > 0).mean() < 0.40


@pytest.mark.parametrize("ny,nx,brc,cr", [(1, 2, 12, 24), (2, 1, 8, 16)])
def test_fused_tail_u8_matches_canvas(tail_setup, rng, ny, nx, brc, cr):
    """u8 epilogue (in-kernel roll + eo-selection + affine + uint8) must be
    byte-identical to the canvas mode followed by the XLA u8/flat pass, on
    RECTANGULAR tiles (core_rows != 120)."""
    tail, params = tail_setup
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 32)) * 0.5,
                    jnp.bfloat16)

    fused = build_fused_tail(params, ny, nx, brc=brc, core_rows=cr,
                             interpret=True)
    canvas = fused(h)                                   # (ny*cr, nx*120, 48)
    out01 = jnp.clip((canvas.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
    u8 = (out01 * 255.0 + 0.5).astype(jnp.uint8)
    hc, wc = u8.shape[:2]
    want = np.asarray(u8.reshape(hc, wc, 4, 12).transpose(0, 2, 1, 3)
                      .reshape(hc * 4, wc * 12))

    fused_u8 = build_fused_tail_u8(params, ny, nx, brc=brc, core_rows=cr,
                                   interpret=True)
    got = np.asarray(fused_u8(h))
    assert got.shape == want.shape
    # identical math up to the f32-roll-then-bf16 ordering: allow 1 level on
    # a vanishing fraction
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_fused_tail_u8_bgr_is_channel_flip(tail_setup, rng):
    """bgr=True must emit exactly the RGB output with the last-dim channel
    triplets reversed (free Seo column permutation; video CLI writer path)."""
    tail, params = tail_setup
    ny, nx, brc, cr = 1, 2, 12, 24
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 32)) * 0.5,
                    jnp.bfloat16)

    rgb = np.asarray(build_fused_tail_u8(params, ny, nx, brc=brc,
                                         core_rows=cr, interpret=True)(h))
    bgr = np.asarray(build_fused_tail_u8(params, ny, nx, brc=brc,
                                         core_rows=cr, interpret=True,
                                         bgr=True)(h))
    H, W = ny * cr * 4, nx * CORE * 4
    rgb3 = rgb.reshape(H, W, 3)
    bgr3 = bgr.reshape(H, W, 3)
    np.testing.assert_array_equal(bgr3, rgb3[..., ::-1])
