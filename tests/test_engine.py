"""Frame-engine tests: grid extract/overlap-add inverses, engine equality
with a direct global computation for local ops, whole-frame mode, and the
flat-uint8 output layout (infer/engine.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.infer.engine import (
    build_frame_engine, extract_grid, overlap_add, _grid,
)
from denoise_gan_tpu.ops.image import depth_to_space


def test_extract_overlap_add_inverse(rng):
    """Weighted overlap-add of extracted tiles with the engine's inverse
    normalization reproduces the padded canvas."""
    tile, ov = 16, 4
    stride = tile - ov
    h = w = 40
    ny, nx = _grid(h, tile, stride), _grid(w, tile, stride)
    ph, pw = (ny - 1) * stride + tile, (nx - 1) * stride + tile
    x = jnp.asarray(rng.random((ph, pw, 5)).astype(np.float32))
    tiles = extract_grid(x, ny, nx, tile, stride)
    ones = jnp.ones((ny * nx, tile, tile, 5), jnp.float32)
    norm = overlap_add(ones, ny, nx, tile, stride)
    acc = overlap_add(tiles, ny, nx, tile, stride)
    np.testing.assert_allclose(np.asarray(acc / norm), np.asarray(x),
                               atol=1e-5)


def _local_forward(rng, scale):
    """A 1x1 'generator': purely local, so tiled and whole-frame engines and
    a direct global computation must all agree exactly."""
    w = jnp.asarray(rng.standard_normal((3, 3 * scale * scale)) * 0.3,
                    jnp.float32)

    def fwd(x):  # (N, t, t, 3) -> (N, t, t, 3*scale^2), in [-1, 1]
        return jnp.tanh(x @ w)

    return fwd, w


def test_engine_matches_direct_tiled_and_whole(rng):
    scale = 4
    H, W = 37, 53
    fwd, w = _local_forward(rng, scale)
    frame01 = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    direct = jnp.tanh((frame01 * 2.0 - 1.0) @ w)
    direct01 = jnp.clip((direct + 1.0) / 2.0, 0.0, 1.0)
    want = depth_to_space(direct01[None], scale)[0]

    eng_t = build_frame_engine(fwd, H, W, scale, tile=16, overlap=4)
    got_t = np.asarray(eng_t(frame01))
    np.testing.assert_allclose(got_t, np.asarray(want), atol=2e-3)

    eng_w = build_frame_engine(fwd, H, W, scale, tile=0)
    got_w = np.asarray(eng_w(frame01))
    np.testing.assert_allclose(got_w, np.asarray(want), atol=1e-5)

    # crop stitching is exact for a local op (any tile computes the same
    # value for its core pixels)
    eng_c = build_frame_engine(fwd, H, W, scale, tile=16, overlap=4,
                               stitch="crop")
    got_c = np.asarray(eng_c(frame01))
    np.testing.assert_allclose(got_c, np.asarray(want), atol=1e-5)


def test_engine_flat_uint8_layout(rng):
    """(H*s, W*s*3) uint8 flat output is byte-identical to HWC."""
    scale = 2
    H, W = 20, 24
    fwd, _ = _local_forward(rng, scale)
    frame01 = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    for tile in (16, 0):  # tiled and whole-frame modes
        eng_hwc = build_frame_engine(fwd, H, W, scale, tile=tile, overlap=4,
                                     out_uint8=True)
        eng_flat = build_frame_engine(fwd, H, W, scale, tile=tile, overlap=4,
                                      out_uint8=True, flat_channels=True)
        hwc = np.asarray(eng_hwc(frame01))
        flat = np.asarray(eng_flat(frame01))
        assert flat.shape == (H * scale, W * scale * 3)
        np.testing.assert_array_equal(
            flat.reshape(H * scale, W * scale, 3), hwc)


def test_engine_batched_frames(rng):
    scale = 2
    H, W = 20, 20
    fwd, _ = _local_forward(rng, scale)
    frames = jnp.asarray(rng.random((3, H, W, 3)).astype(np.float32))
    eng1 = build_frame_engine(fwd, H, W, scale, tile=16, overlap=4)
    engN = build_frame_engine(fwd, H, W, scale, tile=16, overlap=4,
                              frames_per_call=3)
    got = np.asarray(engN(frames))
    for i in range(3):
        np.testing.assert_allclose(got[i], np.asarray(eng1(frames[i])),
                                   atol=1e-6)


def test_engine_bgr_is_channel_flip(rng):
    """bgr=True (scale==1, video-writer path) emits exactly the RGB output
    with channels reversed; scale>1 is rejected (phase-channel layout needs
    the kernel engines' Seo permutation)."""
    import pytest

    H, W = 20, 24
    fwd, _ = _local_forward(rng, 1)
    frame01 = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    eng_rgb = build_frame_engine(fwd, H, W, 1, tile=16, overlap=4,
                                 out_uint8=True, flat_channels=True,
                                 stitch="crop")
    eng_bgr = build_frame_engine(fwd, H, W, 1, tile=16, overlap=4,
                                 out_uint8=True, flat_channels=True,
                                 stitch="crop", bgr=True)
    rgb = np.asarray(eng_rgb(frame01))
    bgr = np.asarray(eng_bgr(frame01))
    np.testing.assert_array_equal(bgr, rgb[..., ::-1])

    with pytest.raises(ValueError):
        build_frame_engine(fwd, H, W, 2, tile=16, overlap=4,
                           out_uint8=True, bgr=True)
