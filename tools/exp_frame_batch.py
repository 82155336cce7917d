#!/usr/bin/env python
"""Frames-per-dispatch probe for the w8a8 kernel engine (round 3).

Wall 37.3 ms vs 36.1 ms device-trace at q8 suggests ~1.2 ms/frame of
dispatch latency through the tunnel (chained dispatches do not fully
pipeline — CLAUDE.md).  Batch F frames per dispatch via lax.map over the
raw (unjitted) engine and measure fps at F in {1, 2, 4}.  Round-1 measured
"frame batching changes nothing" at 13 fps when overhead was ~0.5%; at 27
fps the fraction is 3%, so re-test.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/exp_frame_batch.py [fsrgan|srgan]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine)
    from denoise_gan_tpu.models import build_models

    family = sys.argv[1] if len(sys.argv) > 1 else "fsrgan"
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

    raw = build(variables["params"], variables.get("batch_stats", {}), H, W,
                q8_calib_frame=frames[0], jit_compile=False)

    for F in (1, 2, 4):
        if F == 1:
            eng = build(variables["params"],
                        variables.get("batch_stats", {}), H, W,
                        q8_calib_frame=frames[0])
            batches = frames
        else:
            # one dispatch per F frames; pin the u8 root layout like the
            # F=1 engine does (XLA otherwise inserts a relayout copy)
            from jax.experimental import layout as jlayout
            out_fmt = jlayout.Format(
                jlayout.Layout(major_to_minor=(0, 1, 2, 3, 4, 5)),
                jax.sharding.SingleDeviceSharding(jax.devices()[0]))
            eng = jax.jit(lambda fs: jax.lax.map(raw, fs),
                          out_shardings=out_fmt)
            batches = [jnp.stack([frames[i % 2] for i in range(F)]),
                       jnp.stack([frames[(i + 1) % 2] for i in range(F)])]
        eng(batches[0]).block_until_ready()
        n = max(24 // F, 8)
        t0 = time.time()
        out = None
        for i in range(n):
            out = eng(batches[i % 2])
        out.block_until_ready()
        dt = time.time() - t0
        fps = n * F / dt
        print(f"{family} q8 frames_per_dispatch={F}: {fps:.2f} fps "
              f"({dt/(n*F)*1000:.1f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
