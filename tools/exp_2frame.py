#!/usr/bin/env python
"""Two-frames-per-dispatch probe (VERDICT r3 #4d: the ~1.2 ms wall-vs-
device dispatch gap).

r3's lax.map frame batching COSTS ~3 ms/frame (loop overhead), but the
multires data hints bigger single dispatches amortize the gap: 4K (4x the
pixels of 1080p) ran at 7.0 fps = 28.0 fps-equivalent vs 27.2 at 1080p.
This probe stacks TWO 1080p frames vertically into one (2160, 1920, 3)
input and runs the engine ONCE per pair — same tile geometry, twice the
bands, one dispatch.  Output rows at the seam blend across frames (a few
px); if the timing wins, a production 2-frame mode needs a band-aligned
split with no cross-frame stitch.

Run on a QUIET host:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_2frame.py [fsrgan|srgan|both]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, frames, n=24, label="", frames_per_dispatch=1):
    fn(frames[0]).block_until_ready()
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(frames[i % 2])
    out.block_until_ready()
    dt = time.time() - t0
    eff = n * frames_per_dispatch / dt
    print(f"{label}: {eff:.2f} eff fps ({dt/n*1000:.1f} ms/dispatch)",
          flush=True)
    return eff


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
    one = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
           for _ in range(2)]
    two = [jnp.asarray(rng.random((2 * H, W, 3)), jnp.float32)
           for _ in range(2)]

    e1 = build(params, stats, H, W, q8_calib_frame=one[0])
    f1 = bench(e1, one, label=f"{family} q8 1-frame dispatch")
    e2 = build(params, stats, 2 * H, W, q8_calib_frame=two[0])
    f2 = bench(e2, two, label=f"{family} q8 2-frame dispatch",
               frames_per_dispatch=2)
    print(f"{family} 2-frame speedup: {f2/f1:.3f}x", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fsrgan"
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    for fam in fams:
        run_family(fam)


if __name__ == "__main__":
    main()
