#!/usr/bin/env python
"""End-to-end: kernel engine (fused Pallas tail) vs the XLA crop engine at
1080p, fps + output agreement (PERF.md r2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_kernel_engine.py [brc]
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


def main():
    from denoise_gan_tpu.infer.engine import build_frame_engine
    from denoise_gan_tpu.infer.fast import build_fast_coarse
    from denoise_gan_tpu.infer.kernel_engine import build_fsrgan_kernel_engine
    from denoise_gan_tpu.models import build_models

    brc = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    H, W = 1080, 1920
    bundle = build_models("fsrgan", scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    fwd, scale = build_fast_coarse({"family": "fsrgan", "scale": 4},
                                   params, stats, out_dtype=jnp.bfloat16)
    eng_xla = build_frame_engine(fwd, H, W, scale, 144, 4, stitch="crop",
                                 out_uint8=True, flat_channels=True,
                                 acc_dtype=jnp.bfloat16)
    for prep in ("transpose", "conv"):
        eng_k = build_fsrgan_kernel_engine(params, stats, H, W, brc=brc,
                                           prep=prep)
        a = np.asarray(eng_k(frames[0])).astype(np.int32)
        b = np.asarray(eng_xla(frames[0])).astype(np.int32)
        d = np.abs(a - b)
        print(f"kernel({prep}) vs xla-crop engine: max={d.max()} "
              f"frac>1={(d > 1).mean():.5f}", flush=True)
        bench(eng_k, frames, label=f"kernel engine brc={brc}/{prep}")
    bench(eng_xla, frames, label="xla crop engine 144/4")


if __name__ == "__main__":
    main()
