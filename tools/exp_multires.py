#!/usr/bin/env python
"""Flagship (fsrgan) kernel-engine fps across input sizes at the round-3
defaults (w8a8 tail, brc=27).  Refreshes the r2 multi-resolution table
(720p 45.3 / 1080p 24.9 / 4K 6.4 at bf16+brc=45).

plan_grid auto-derives the per-resolution grid (4K lands on the same
4x32 x (544x124) plan as r2: body batch 128).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_multires.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, plan_grid)
    from denoise_gan_tpu.models import build_models

    bundle = build_models("fsrgan", scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    rng = np.random.default_rng(0)

    for label, H, W in (("720p", 720, 1280), ("1080p", 1080, 1920),
                        ("4K", 2160, 3840)):
        frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
                  for _ in range(2)]
        eng = build_fsrgan_kernel_engine(
            variables["params"], variables.get("batch_stats", {}), H, W,
            q8_calib_frame=frames[0])
        eng(frames[0]).block_until_ready()
        n = 24
        t0 = time.time()
        out = None
        for i in range(n):
            out = eng(frames[i % 2])
        out.block_until_ready()
        dt = time.time() - t0
        ny, nx, cr = plan_grid(H, W, 27)
        print(f"fsrgan q8 {label} ({H}x{W}, grid {ny}x{nx} of "
              f"{cr + 4}x124): {n/dt:.2f} fps ({dt/n*1000:.1f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
