#!/usr/bin/env python
"""Ablate the fused tail kernel stage by stage at the PRODUCTION geometry
(8x16 tiles, core 135x120) to locate its cost (PERF.md r2).

Stages: 0 dma+hrolls only | 1 +up1 | 2 +u1 rolls | 3 +up2 | 4 +x3 build |
5 full (canvas) | u8 (full fused epilogue).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tail_ablate.py [brc ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.models.fsrgan import FSRGANTail
from denoise_gan_tpu.ops.pallas.tail import (
    T, build_tail_call, make_h3, prep_weights,
)


def timeit(fn, inputs, n=24, label=""):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(inputs[i % 2])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    brcs = [int(a) for a in sys.argv[1:]] or [15, 9, 27]
    ny, nx, cr = 8, 16, 135            # 1080p production grid
    N = ny * nx
    tr = cr + 4

    tail = FSRGANTail()
    h0 = jnp.zeros((1, tr, T, 32), jnp.float32)
    params = tail.init(jax.random.key(0), h0)["params"]
    weights = prep_weights(params)

    rng = np.random.default_rng(0)
    hs = [jnp.asarray(rng.standard_normal((N, tr, T, 32)) * 0.5,
                      jnp.bfloat16) for _ in range(2)]
    h3s = [jax.jit(make_h3)(h) for h in hs]

    import os
    stages = [int(s) for s in os.environ.get("STAGES", "1,2,3,4,5").split(",")
              if s]
    for brc in brcs:
        if cr % brc:
            continue
        for stage in stages:
            fn = jax.jit(build_tail_call(weights, ny, nx, brc=brc,
                                         core_rows=cr, stage=stage))
            timeit(fn, h3s, label=f"brc={brc} stage={stage} (canvas)")
        fn = jax.jit(build_tail_call(weights, ny, nx, brc=brc,
                                     core_rows=cr, u8_out=True))
        timeit(fn, h3s, label=f"brc={brc} u8 full")


if __name__ == "__main__":
    main()
