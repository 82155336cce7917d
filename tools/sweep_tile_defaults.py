#!/usr/bin/env python
"""XLA crop-engine tile/overlap sweep (VERDICT r2 #7): find the fastest
(tile, overlap) per 1x family at 1080p so the CLI defaults match measured
optima.  The 4x families default to the fused kernel engine (fixed
geometry); their XLA fallback inherits the same sweep table.

Each (tile, overlap) is a fresh engine compile (~1-5 min via the remote
tunnel) — keep the grid small.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_tile_defaults.py [family ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, frames, n=16):
    fn(frames[0]).block_until_ready()
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(frames[i % 2])
    out.block_until_ready()
    return n / (time.time() - t0)


def run_family(family: str, grid):
    from denoise_gan_tpu.infer.engine import build_frame_engine
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models(family, scale=1)
    # pix2pix's 8-downsample U-Net needs a >=256 init shape (64^2 bottoms
    # out at 1x1 and the skip concat mismatches)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 256, 256, 3), jnp.float32), train=False)

    def fwd(tiles):
        return bundle.generator.apply(variables, tiles, train=False)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]
    best = (0.0, None)
    for tile, ov in grid:
        try:
            eng = build_frame_engine(fwd, H, W, 1, tile, ov,
                                     out_uint8=True, flat_channels=True,
                                     stitch="crop",
                                     acc_dtype=jnp.bfloat16)
            fps = bench(eng, frames)
        except Exception as e:  # noqa: BLE001
            print(f"{family} tile={tile}/{ov}: FAILED {type(e).__name__}",
                  flush=True)
            continue
        print(f"{family} tile={tile}/{ov}: {fps:.2f} fps", flush=True)
        if fps > best[0]:
            best = (fps, (tile, ov))
    print(f"=> {family} best: {best[1]} at {best[0]:.2f} fps", flush=True)


def main():
    fams = sys.argv[1:] or ["autoencoder", "pix2pix"]
    # pix2pix's U-Net concats 8 levels of skips: tile must be % 256 == 0
    grids = {
        "pix2pix": [(256, 32), (256, 8), (256, 4), (512, 8)],
    }
    default_grid = [(256, 32), (256, 8), (192, 8), (144, 4), (128, 8)]
    for fam in fams:
        try:
            run_family(fam, grids.get(fam, default_grid))
        except Exception as e:  # noqa: BLE001
            print(f"{fam}: sweep FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
