#!/usr/bin/env python
"""u8 frame-input measurement (VERDICT r3 #4b): device fps of the fused
kernel engines with the production uint8-BGR input path vs the f32 path.

u8_input moves 1 byte/px through pad/extract (vs 2 at bf16) and ships the
decoder's u8 frame verbatim (4x fewer H2D bytes on the CLI path; H2D is
not in this device-fps loop — both variants use device-resident frames).

Run on a QUIET host (TF trainings corrupt fps numbers — CLAUDE.md r3):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_u8_input.py [fsrgan|srgan|both]
"""

from __future__ import annotations

import sys
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


def run_family(family: str):
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine)
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models(family, scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    build = (build_fsrgan_kernel_engine if family == "fsrgan"
             else build_srgan_kernel_engine)

    rng = np.random.default_rng(0)
    host = [rng.random((H, W, 3)).astype(np.float32) for _ in range(2)]
    f32 = [jnp.asarray(f) for f in host]
    # the production CLI ships the decoder's BGR u8 bytes verbatim
    u8 = [jnp.asarray((f[..., ::-1] * 255.0 + 0.5).astype(np.uint8))
          for f in host]

    eng_f32 = build(params, stats, H, W, q8_calib_frame=f32[0], bgr=True)
    fps_f32 = bench(eng_f32, f32, label=f"{family} q8 f32-input")
    # bgr_input flips the stem weights so the BGR u8 frames are read
    # correctly (the video CLI sets u8_input+bgr_input together,
    # infer/video.py:209-210; omitting bgr_input here fed BGR bytes to an
    # RGB stem and corrupted the quality comparison)
    eng_u8 = build(params, stats, H, W, q8_calib_frame=f32[0], bgr=True,
                   u8_input=True, bgr_input=True)
    fps_u8 = bench(eng_u8, u8, label=f"{family} q8 u8-BGR-input")

    a = np.asarray(eng_f32(f32[1])).astype(np.int32)
    b = np.asarray(eng_u8(u8[1])).astype(np.int32)
    diff = np.abs(a - b)
    print(f"{family} u8-vs-f32 input: max {diff.max()} u8 levels, "
          f"frac>0 {100*(diff > 0).mean():.3f}%, "
          f"speedup {fps_u8/fps_f32:.3f}x", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    for fam in fams:
        run_family(fam)


if __name__ == "__main__":
    main()
