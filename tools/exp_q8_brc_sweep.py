#!/usr/bin/env python
"""brc (band-rows) sweep for the w8a8 kernel engines (round 3).

brc=45 (fsrgan) / 15 (srgan) were tuned under the bf16 tail; w8a8 shifts
the tail's compute/traffic balance, so re-sweep the band size at the q8
production config.  Each point is a fresh compile (~1-5 min through the
tunnel) — grids stay small.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/exp_q8_brc_sweep.py [fsrgan|srgan|both]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, frames, n=24):
    fn(frames[0]).block_until_ready()
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(frames[i % 2])
    out.block_until_ready()
    return n / (time.time() - t0)


def run_family(family: str, brcs):
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine)
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models(family, scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    build = (build_fsrgan_kernel_engine if family == "fsrgan"
             else build_srgan_kernel_engine)
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]
    best = (0.0, None)
    for brc in brcs:
        try:
            eng = build(variables["params"],
                        variables.get("batch_stats", {}), H, W, brc=brc,
                        q8_calib_frame=frames[0])
            fps = bench(eng, frames)
        except Exception as e:  # noqa: BLE001
            print(f"{family} q8 brc={brc}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"{family} q8 brc={brc}: {fps:.2f} fps", flush=True)
        if fps > best[0]:
            best = (fps, brc)
    print(f"=> {family} q8 best brc: {best[1]} at {best[0]:.2f} fps",
          flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    grids = {"fsrgan": [27, 45, 60, 90], "srgan": [9, 15, 27, 45]}
    for fam in fams:
        run_family(fam, grids[fam])


if __name__ == "__main__":
    main()
