#!/usr/bin/env python
"""Experiment: crop-stitch vs feather-stitch — speed and closeness to the
EXACT whole-frame output with the real fsrgan generator (PERF.md r2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_crop_stitch.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, frames, n=24, label=""):
    fn(frames[0]).block_until_ready()
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(frames[i % 2])
    out.block_until_ready()
    dt = time.time() - t0
    print(f"{label}: {n/dt:.2f} fps ({dt/n*1000:.1f} ms/frame)", flush=True)
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

    kw = dict(out_uint8=True, flat_channels=True, acc_dtype=jnp.bfloat16)
    eng_feather = build_frame_engine(fwd, H, W, scale, 144, 4, **kw)
    eng_crop = build_frame_engine(fwd, H, W, scale, 144, 4, stitch="crop",
                                  **kw)
    eng_crop8 = build_frame_engine(fwd, H, W, scale, 144, 8, stitch="crop",
                                   **kw)
    eng_whole = build_frame_engine(fwd, H, W, scale, 0, **kw)

    exact = np.asarray(eng_whole(frames[0])).astype(np.int32)
    for name, eng in [("feather 144/4", eng_feather),
                      ("crop 144/4", eng_crop), ("crop 144/8", eng_crop8)]:
        got = np.asarray(eng(frames[0])).astype(np.int32)
        d = np.abs(got - exact)
        print(f"{name} vs exact: max={d.max()} mean={d.mean():.4f} "
              f"frac>1={(d > 1).mean():.5f}", flush=True)

    bench(eng_feather, frames, label="feather 144/4")
    bench(eng_crop, frames, label="crop    144/4")
    bench(eng_crop8, frames, label="crop    144/8")


if __name__ == "__main__":
    main()
