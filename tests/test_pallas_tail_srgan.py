"""Fused SRGAN tail kernel (ops/pallas/tail_srgan.py) vs the plain
SRGANTail module, in interpret mode on CPU (same harness as
test_pallas_tail.py for the FSRGAN kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.models.srgan import SRGANTail
from denoise_gan_tpu.ops.image import depth_to_space
from denoise_gan_tpu.ops.pallas.tail import CORE, T
from denoise_gan_tpu.ops.pallas.tail_srgan import (
    build_fused_tail64, build_fused_tail64_u8,
)


@pytest.fixture(scope="module")
def tail_setup():
    tail = SRGANTail(scale=4)
    h0 = jnp.zeros((1, T, T, 64), jnp.float32)
    params = tail.init(jax.random.key(0), h0)["params"]
    return tail, params


def _plain_core(tail, params, h_tiles, ny, nx):
    fine = tail.apply({"params": params}, h_tiles)      # (N, 4T, 4T, 3)
    m0 = 2 * 4
    core = fine[:, m0:m0 + CORE * 4, m0:m0 + CORE * 4, :]
    core = core.reshape(ny, nx, CORE * 4, CORE * 4, 3)
    return core.transpose(0, 2, 1, 3, 4).reshape(ny * CORE * 4,
                                                 nx * CORE * 4, 3)


@pytest.mark.parametrize("ny,nx,brc", [(1, 1, 12), (2, 1, 24)])
def test_fused_tail64_matches_plain(tail_setup, rng, ny, nx, brc):
    tail, params = tail_setup
    h = jnp.asarray(rng.standard_normal((ny * nx, T, T, 64)) * 0.5,
                    jnp.float32)

    fused = build_fused_tail64(params, ny, nx, brc=brc, interpret=True)
    got48 = fused(h.astype(jnp.bfloat16))               # (nyC, nxC, 48)
    got = np.asarray(depth_to_space(
        got48.astype(jnp.float32)[None], 4)[0])

    want = np.asarray(_plain_core(tail, params, h, ny, nx))
    np.testing.assert_allclose(got, want, atol=3e-2)
    assert np.abs(got - want).mean() < 4e-3


def test_fused_tail64_u8_matches_canvas(tail_setup, rng):
    """u8 epilogue must be byte-identical to canvas + XLA u8/flat pass."""
    tail, params = tail_setup
    ny, nx, brc, cr = 1, 2, 12, 24
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 64)) * 0.5,
                    jnp.bfloat16)

    canvas = build_fused_tail64(params, ny, nx, brc=brc, core_rows=cr,
                                interpret=True)(h)      # (ny*cr, nx*C, 48)
    out01 = jnp.clip((canvas.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
    want = np.asarray((out01 * 255.0 + 0.5).astype(jnp.uint8))
    want_fine = np.asarray(depth_to_space(
        jnp.asarray(want, jnp.float32)[None], 4)[0]).astype(np.uint8)

    out5 = build_fused_tail64_u8(params, ny, nx, brc=brc, core_rows=cr,
                                 interpret=True)(h)
    got_flat = np.asarray(out5).reshape(ny * cr * 4, nx * CORE * 12)
    got_fine = got_flat.reshape(ny * cr * 4, nx * CORE * 4, 3)
    diff = np.abs(got_fine.astype(np.int32) - want_fine.astype(np.int32))
    assert diff.max() <= 1          # bf16 epilogue vs f32 XLA affine
    assert (diff > 0).mean() < 0.02


def test_fused_tail64_q8_within_engine_envelope(tail_setup, rng):
    """srgan w8a8 tail (int8 up2/final dots) vs the bf16 kernel on final u8
    pixels: inside the engine quality envelope (VERDICT r2 #1)."""
    from denoise_gan_tpu.ops.pallas.tail_srgan import build_fused_tail64_u8

    tail, params = tail_setup
    ny, nx, brc, cr = 1, 1, 12, 24
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 64)) * 0.5,
                    jnp.bfloat16)

    base = build_fused_tail64_u8(params, ny, nx, brc=brc, core_rows=cr,
                                 interpret=True)
    q8 = build_fused_tail64_u8(params, ny, nx, brc=brc, core_rows=cr,
                               interpret=True,
                               q8_calib=h.astype(jnp.float32))
    got = np.asarray(q8(h)).astype(np.int32)
    want = np.asarray(base(h)).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 5e-3
    # threshold covers the 1.25x calibration headroom margin (ADVICE r3)
    assert (diff > 0).mean() < 0.35


def test_fused_tail64_qh8_within_engine_envelope(tail_setup, rng):
    """srgan qh8 (int8 h3 DMA + w8a8 up1 on top of the w8a8 tail, VERDICT r3
    #4a/#4c) vs the bf16 kernel: same acceptance envelope."""
    from denoise_gan_tpu.ops.pallas.tail_srgan import build_fused_tail64_u8

    tail, params = tail_setup
    ny, nx, brc, cr = 1, 1, 12, 24
    tr = cr + 4
    h = jnp.asarray(rng.standard_normal((ny * nx, tr, T, 64)) * 0.5,
                    jnp.bfloat16)

    base = build_fused_tail64_u8(params, ny, nx, brc=brc, core_rows=cr,
                                 interpret=True)
    qh8 = build_fused_tail64_u8(params, ny, nx, brc=brc, core_rows=cr,
                                interpret=True,
                                q8_calib=h.astype(jnp.float32), qh8=True)
    got = np.asarray(qh8(h)).astype(np.int32)
    want = np.asarray(base(h)).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 2, diff.max()
    assert (diff > 1).mean() < 5e-3
    assert (diff > 0).mean() < 0.40


def test_srgan_kernel_engine_matches_plain_generator(rng):
    from denoise_gan_tpu.infer.kernel_engine import (
        build_srgan_kernel_engine, flat_view, plan_grid,
    )
    from denoise_gan_tpu.models import build_models

    H, W = 100, 150
    bundle = build_models("srgan", scale=4)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, T, T, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    frame01 = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    eng = build_srgan_kernel_engine(params, stats, H, W, brc=25,
                                    interpret=True)
    out5 = eng(frame01)
    assert out5.ndim == 5
    got = np.ascontiguousarray(flat_view(out5, H, W))
    assert got.shape == (H * 4, W * 4 * 3)

    from denoise_gan_tpu.infer.engine import extract_grid

    ny, nx, cr = plan_grid(H, W, brc=25)
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
    assert diff.max() <= 3
    assert (diff > 1).mean() < 0.01
