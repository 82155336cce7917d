#!/usr/bin/env python
"""Experiment: tiled engine vs whole-frame coarse-canvas engine (PERF.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_whole_frame.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, frames, n=16, label=""):
    fn(frames[0]).block_until_ready()  # compile
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(frames[i % 2])
    out.block_until_ready()
    dt = time.time() - t0
    print(f"{label}: {n/dt:.2f} fps  ({dt/n*1000:.1f} ms/frame)", flush=True)
    return n / dt


def main():
    from denoise_gan_tpu.infer.engine import build_frame_engine
    from denoise_gan_tpu.infer.fast import build_fast_coarse
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models("fsrgan", scale=4, fp16=True)
    x0 = jnp.zeros((1, 144, 144, 3), jnp.float32)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)
    fwd, scale = build_fast_coarse(
        {"family": "fsrgan", "scale": 4}, variables["params"],
        variables.get("batch_stats", {}), out_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    eng_tiled = build_frame_engine(fwd, H, W, scale, 144, 4,
                                   out_uint8=True, flat_channels=True,
                                   acc_dtype=jnp.bfloat16)
    eng_whole = build_frame_engine(fwd, H, W, scale, 0,
                                   out_uint8=True, flat_channels=True,
                                   acc_dtype=jnp.bfloat16)

    a = np.asarray(eng_tiled(frames[0]))
    b = np.asarray(eng_whole(frames[0]))
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    print(f"tiled-vs-whole u8 diff: max={diff.max()} "
          f"frac>1={(diff > 1).mean():.4f}", flush=True)

    bench(eng_tiled, frames, label="tiled 144/4")
    bench(eng_whole, frames, label="whole-frame")


if __name__ == "__main__":
    main()
