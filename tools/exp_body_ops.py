#!/usr/bin/env python
"""Body cost decomposition at the production engine geometry (128 tiles of
139x124, bf16).  The axon runtime elides repeated dispatches AND XLA DCEs
any op whose output isn't fully consumed, so each measurement is ONE program
running REPS chained body applications (output fed back through a random
1x1 32->3 projection, every element live).

Variants: full body | body without depthwise convs | body without
expand/project (dw only) — differences give the dw vs matmul-conv split.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_body_ops.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def conv(x, cout, k, groups=1, key=0):
    cin = x.shape[-1]
    w = (jax.random.normal(jax.random.key(key), (k, k, cin // groups, cout),
                           jnp.bfloat16)
         * jnp.bfloat16(0.3 / np.sqrt(k * k * cin)))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def body(x, use_dw=True, use_exp=True):
    c1 = jnp.maximum(conv(x, 32, 3, key=1), 0)            # stem
    r = c1
    for blk in range(6):
        inp = r
        h = r
        if use_exp and blk:
            h = jnp.maximum(conv(h, 192, 1, key=10 + blk), 0)   # expand
        if use_dw:
            h = jnp.maximum(conv(h, h.shape[-1], 3, groups=h.shape[-1],
                                 key=20 + blk), 0)              # depthwise
        if use_exp or h.shape[-1] != 32:
            h = conv(h, 32, 1, key=30 + blk)                    # project
        r = inp + h
    c2 = conv(r, 32, 3, key=2)                            # post
    return c2 + c1


def chained(**kw):
    @jax.jit
    def fn(x):
        def step(i, z):
            y = body(z + jnp.bfloat16(i) * jnp.bfloat16(1e-6), **kw)
            return conv(y, 3, 1, key=99)                  # keep all live
        return jax.lax.fori_loop(0, REPS, step, x)
    return fn


def timeit(fn, xs, n=4, label=""):
    # NOTE: through the axon tunnel block_until_ready does NOT reliably
    # block on these programs — fetch a scalar to force execution.
    fetch = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(fetch(fn(xs[0])))
    t0 = time.time()
    for i in range(n):
        float(fetch(fn(xs[i % 2])))
    dt = (time.time() - t0) / n / REPS * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    N, H, W = 128, 139, 124
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, H, W, 3)) * 0.5, jnp.bfloat16)
          for _ in range(2)]

    t_full = timeit(chained(), xs, label="full body (chained)")
    t_nodw = timeit(chained(use_dw=False), xs, label="body w/o depthwise")
    t_dwonly = timeit(chained(use_exp=False), xs, label="body dw@32 only")
    print(f"=> dw total ~{t_full - t_nodw:.2f} ms; "
          f"matmul-conv total ~{t_nodw:.2f} ms (incl. feedback proj)")


if __name__ == "__main__":
    main()
