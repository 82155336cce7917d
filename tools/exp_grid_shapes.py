#!/usr/bin/env python
"""Grid-shape sweep for the kernel engine at 1080p: the tail kernel's tile
height is free (internal band loop), so the grid can trade tile batch for
tile height.  XLA convs cliff above batch 128 (PERF.md r2); this measures
whether batch 64/32/16 (taller tiles, less row-halo waste) is faster still.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_grid_shapes.py [ny ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_list, n=24, label=""):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    from denoise_gan_tpu.infer.kernel_engine import build_fsrgan_kernel_engine
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.fsrgan import FSRGANBody
    from denoise_gan_tpu.ops.pallas.tail import T

    H, W = 1080, 1920
    nys = [int(a) for a in sys.argv[1:]] or [8, 4, 2]
    # ny -> core_rows multiple of brc=15 covering 1080
    plans = {8: 135, 4: 270, 2: 540, 1: 1080}

    bundle = build_models("fsrgan", scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, T, T, 3), jnp.float32), train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    body = FSRGANBody(dtype=jnp.bfloat16)
    body_p, body_s = params["body"], stats.get("body", {})
    body_fn = jax.jit(lambda x: body.apply(
        {"params": body_p, "batch_stats": body_s}, x, train=False))

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    for ny in nys:
        cr = plans[ny]
        tr = cr + 4
        n_tiles = ny * 16
        tiles = [jnp.asarray(rng.standard_normal((n_tiles, tr, T, 3)),
                             jnp.float32) * 0.5 for _ in range(2)]
        timeit(body_fn, [(t,) for t in tiles],
               label=f"body ny={ny} ({n_tiles}x{tr}x{T})")

    for ny in nys:
        eng = build_fsrgan_kernel_engine(
            params, stats, H, W, brc=15,
            plan=(ny, 16, plans[ny]))
        timeit(eng, [(f,) for f in frames], label=f"engine ny={ny}")


if __name__ == "__main__":
    main()
