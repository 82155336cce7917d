#!/usr/bin/env python
"""Stage ablation of the SRGAN fused tail kernel at the production 1080p
geometry (8x16 grid, brc=15).  Stages: 1 dma+hrolls+up1 | 2 +u1 rolls |
3 +up2 (8 b-split matmuls) | 4 +x3 pack | 5 full canvas | u8 full.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tail64_ablate.py [brc ...]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.models.srgan import SRGANTail
from denoise_gan_tpu.ops.pallas.tail import T
from denoise_gan_tpu.ops.pallas.tail_srgan import (
    build_tail64_call, make_h3, prep_weights_srgan, CIN,
)


def timeit(fn, inputs, n=24, label=""):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(inputs[i % 2])
    out.block_until_ready()
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    brcs = [int(a) for a in sys.argv[1:]] or [15]
    ny, nx, cr = 8, 16, 135
    N, tr = ny * nx, cr + 4

    tail = SRGANTail(scale=4)
    h0 = jnp.zeros((1, tr, T, CIN), jnp.float32)
    params = tail.init(jax.random.key(0), h0)["params"]
    weights = prep_weights_srgan(params)

    rng = np.random.default_rng(0)
    hs = [jnp.asarray(rng.standard_normal((N, tr, T, CIN)) * 0.5,
                      jnp.bfloat16) for _ in range(2)]
    h3s = [jax.jit(lambda h: make_h3(h, cin=CIN))(h) for h in hs]

    stages = [int(s) for s in os.environ.get("STAGES", "1,2,3,4,5").split(",")
              if s]
    for brc in brcs:
        if cr % brc:
            continue
        for stage in stages:
            fn = jax.jit(build_tail64_call(weights, ny, nx, brc=brc,
                                           core_rows=cr, stage=stage))
            timeit(fn, h3s, label=f"brc={brc} stage={stage} (canvas)")
        fn = jax.jit(build_tail64_call(weights, ny, nx, brc=brc,
                                       core_rows=cr, u8_out=True))
        timeit(fn, h3s, label=f"brc={brc} u8 full")


if __name__ == "__main__":
    main()
