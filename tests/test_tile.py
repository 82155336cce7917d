"""Overlap tiling: coverage, identity stitching, upscale stitching."""

import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.infer.tile import (
    extract_tiles, plan_positions, plan_tiles, stitch_tiles, tiled_apply,
)
from denoise_gan_tpu.ops.image import depth_to_space


def test_plan_positions_cover_and_clamp():
    pos = plan_positions(100, 32, 8)
    assert pos[0] == 0 and pos[-1] == 100 - 32
    covered = np.zeros(100, bool)
    for p in pos:
        covered[p:p + 32] = True
    assert covered.all()
    assert plan_positions(16, 32, 8) == [0]


def test_identity_roundtrip(rng):
    img = jnp.asarray(rng.random((70, 90, 3)).astype(np.float32))
    tiles = extract_tiles(img, 32, 8)
    out = stitch_tiles(tiles, 70, 90, 32, 8, scale=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_identity_roundtrip_small_image(rng):
    img = jnp.asarray(rng.random((20, 25, 3)).astype(np.float32))
    tiles = extract_tiles(img, 32, 8)
    out = stitch_tiles(tiles, 20, 25, 32, 8, scale=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_upscale_stitch_matches_global_op(rng):
    """A 2x pixel-shuffle-style op applied per-tile then stitched must equal
    the op applied globally (it is local), proving seamless blending."""
    img = jnp.asarray(rng.random((64, 96, 12)).astype(np.float32))

    def per_tile(t):
        return depth_to_space(t, 2)

    got = tiled_apply(per_tile, img, tile=32, overlap=8, scale=2)
    want = depth_to_space(img[None], 2)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tiled_apply_batched(rng):
    img = jnp.asarray(rng.random((64, 64, 4)).astype(np.float32))
    got = tiled_apply(lambda t: t * 2.0, img, tile=32, overlap=8, scale=1,
                      batch=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(img) * 2, atol=1e-5)
