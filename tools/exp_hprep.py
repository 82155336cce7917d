#!/usr/bin/env python
"""Time XLA h-prep variants for the fused tail kernel (PERF.md r2).

(a) make_h3b v1: pad+transpose+3xslice+band-gather+transpose (637MB out)
(b) v2: pad+transpose+3xslice+transpose+reshape, no band duplication (425MB)
(c) v2 minus the final transpose (what it costs)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_hprep.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.ops.pallas.tail import T, make_h3b


def timeit(fn, inputs, n=24, label=""):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(inputs[i % 2])
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)


def prep_v2(h_tiles):
    n = h_tiles.shape[0]
    hp = jnp.pad(h_tiles.astype(jnp.bfloat16),
                 ((0, 0), (3, 3), (3, 3), (0, 0)))        # (N,130,130,32)
    ht = hp.transpose(0, 1, 3, 2)                         # (N,130,32,130)
    h3 = jnp.stack([ht[..., dc:dc + 128] for dc in range(3)],
                   axis=1)                                # (N,3,130,32,128)
    h3 = h3.transpose(0, 1, 3, 2, 4)                      # (N,3,32,130,128)
    return h3.reshape(n, 3, 32, 130 * 128)


def prep_v2_notrans(h_tiles):
    n = h_tiles.shape[0]
    hp = jnp.pad(h_tiles.astype(jnp.bfloat16),
                 ((0, 0), (3, 3), (3, 3), (0, 0)))
    ht = hp.transpose(0, 1, 3, 2)
    h3 = jnp.stack([ht[..., dc:dc + 128] for dc in range(3)], axis=1)
    return h3                                             # (N,3,130,32,128)


def main():
    rng = np.random.default_rng(0)
    N = 144
    hs = [jnp.asarray(rng.standard_normal((N, T, T, 32)) * 0.5,
                      jnp.bfloat16) for _ in range(2)]
    timeit(jax.jit(lambda h: make_h3b(h, 12)), hs, label="v1 make_h3b(12)")
    timeit(jax.jit(prep_v2), hs, label="v2 full")
    timeit(jax.jit(prep_v2_notrans), hs, label="v2 w/o final transpose")


if __name__ == "__main__":
    main()
