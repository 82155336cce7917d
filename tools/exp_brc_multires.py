#!/usr/bin/env python
"""brc sweep at 720p and 4K for the w8a8 kernel engines (VERDICT r3 #6).

brc=27 came from a 1080p-only sweep (tools/exp_q8_brc_sweep.py); the bf16
optimum already moved 45<->15 between families, so verify the w8a8 optimum
across resolutions and make brc=None resolution-aware if it moves.

Each point is a fresh compile (~1-5 min through the tunnel).  Run on a
QUIET host (CPU load corrupts fps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/exp_brc_multires.py [fsrgan|srgan|both] [res...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

RES = {"720p": (720, 1280), "1080p": (1080, 1920), "4k": (2160, 3840)}


def bench(fn, frames, n=24):
    fn(frames[0]).block_until_ready()
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(frames[i % 2])
    out.block_until_ready()
    return n / (time.time() - t0)


def run(family: str, res_keys):
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine, plan_grid)
    from denoise_gan_tpu.models import build_models

    bundle = build_models(family, scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    build = (build_fsrgan_kernel_engine if family == "fsrgan"
             else build_srgan_kernel_engine)
    rng = np.random.default_rng(0)
    brcs = [9, 15, 27, 45] if family == "srgan" else [15, 27, 45]

    for rk in res_keys:
        H, W = RES[rk]
        frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
                  for _ in range(2)]
        best = (0.0, None)
        for brc in brcs:
            ny, nx, cr = plan_grid(H, W, brc)
            try:
                eng = build(variables["params"],
                            variables.get("batch_stats", {}), H, W, brc=brc,
                            q8_calib_frame=frames[0])
                fps = bench(eng, frames)
            except Exception as e:  # noqa: BLE001
                print(f"{family} q8 {rk} brc={brc}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            print(f"{family} q8 {rk} brc={brc} (grid {ny}x{nx} of "
                  f"{cr + 4}x124): {fps:.2f} fps", flush=True)
            if fps > best[0]:
                best = (fps, brc)
        print(f"{family} q8 {rk} BEST: brc={best[1]} ({best[0]:.2f} fps)",
              flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    res_keys = [a.lower() for a in sys.argv[2:]] or ["720p", "4k"]
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    for fam in fams:
        run(fam, res_keys)


if __name__ == "__main__":
    main()
