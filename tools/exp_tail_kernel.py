#!/usr/bin/env python
"""On-chip check of the fused Pallas tail: correctness vs the XLA coarse
tail + crop_stitch, and timing at the 1080p geometry (PERF.md r2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tail_kernel.py [brc ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    from denoise_gan_tpu.infer.engine import crop_stitch
    from denoise_gan_tpu.infer.fast import build_coarse_tail
    from denoise_gan_tpu.models.fsrgan import FSRGANTail
    from denoise_gan_tpu.ops.pallas.tail import CORE, T, build_fused_tail

    brcs = [int(a) for a in sys.argv[1:]] or [12, 8]
    ny, nx = 9, 16                      # 1080p at tile 124 / stride 120
    N = ny * nx

    tail = FSRGANTail()
    h0 = jnp.zeros((1, T, T, 32), jnp.float32)
    params = tail.init(jax.random.key(0), h0)["params"]

    rng = np.random.default_rng(0)
    hs = [jnp.asarray(rng.standard_normal((N, T, T, 32)) * 0.5,
                      jnp.bfloat16) for _ in range(2)]

    # XLA reference path: coarse tail (phased) + crop_stitch
    xtail = build_coarse_tail(params, ["up1", "up2"],
                              params["out_conv"]["kernel"],
                              params["out_conv"]["bias"],
                              jnp.bfloat16, final_d2s=False,
                              out_dtype=jnp.bfloat16)

    @jax.jit
    def xla_path(h):
        return crop_stitch(xtail(h), ny, nx, T, CORE)

    want = np.asarray(xla_path(hs[0]), np.float32)

    for brc in brcs:
        for prep in ("transpose", "conv"):
            try:
                fused = jax.jit(build_fused_tail(params, ny, nx, brc=brc,
                                                 prep=prep))
                got = np.asarray(fused(hs[0]), np.float32)
            except Exception as e:
                print(f"brc={brc}/{prep}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            d = np.abs(got - want)
            print(f"brc={brc}/{prep}: maxdiff={d.max():.4f} "
                  f"meandiff={d.mean():.5f}", flush=True)
            timeit(fused, hs, label=f"pallas fused tail brc={brc}/{prep}")

    timeit(xla_path, hs, label="XLA tail+crop_stitch")


if __name__ == "__main__":
    main()
