#!/usr/bin/env python
"""qh8 measurement (VERDICT r3 #4a/#4c): fps + on-chip quality for the
fsrgan and srgan kernel engines — q8 (w8a8 up2/final, the r3 default) vs
qh8 (q8 + int8 h3 DMA + w8a8 up1) at 1080p.

The h3 DMA is the tail's largest input (stage 1 = 4.3/8.0 ms bf16 incl.
up1); qh8 halves its bytes and runs up1 on the int8 MXU.  Quality is the
byte diff vs the q8 engine on the same frame (both are within the accepted
envelope of the exact module separately; this isolates the h-quantization
contribution).

Run on a QUIET host (TF trainings corrupt fps numbers — CLAUDE.md r3):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_qh8.py [fsrgan|srgan|both]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, frames, n=24, label=""):
    out = fn(frames[0])
    out.block_until_ready()
    t0 = time.time()
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
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    q8 = build(params, stats, H, W, q8_calib_frame=frames[0])
    f_q8 = bench(q8, frames, label=f"{family} q8 (r3 default)")
    qh8 = build(params, stats, H, W, q8_calib_frame=frames[0], qh8=True)
    f_qh8 = bench(qh8, frames, label=f"{family} qh8 (int8 h3 + w8a8 up1)")

    a = np.asarray(q8(frames[1])).astype(np.int32)
    b = np.asarray(qh8(frames[1])).astype(np.int32)
    diff = np.abs(a - b)
    print(f"{family} qh8-vs-q8 quality: max {diff.max()} u8 levels, "
          f"frac>0 {100*(diff > 0).mean():.3f}%, "
          f"frac>1 {100*(diff > 1).mean():.4f}%", flush=True)
    print(f"{family} qh8 speedup over q8: {f_qh8/f_q8:.3f}x", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    for fam in fams:
        run_family(fam)


if __name__ == "__main__":
    main()
