#!/usr/bin/env python
"""NHWC vs NCHW body layout probe (chained, in-program reps; value-fetch
timing — block_until_ready lies through the tunnel).

If XLA's depthwise cost (17.5 of the 23.4 ms body) is partly NHWC layout
churn (C=192 on lanes = 1.5 vregs/px), an NCHW body (space on lanes) may cut
it.  Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_body_nchw.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def conv(x, cout, k, groups=1, key=0, nchw=False):
    cin = x.shape[1] if nchw else x.shape[-1]
    w = (jax.random.normal(jax.random.key(key), (k, k, cin // groups, cout),
                           jnp.bfloat16)
         * jnp.bfloat16(0.3 / np.sqrt(k * k * cin)))
    dn = ("NCHW", "HWIO", "NCHW") if nchw else ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=dn, preferred_element_type=jnp.bfloat16)


def body(x, nchw=False):
    ax = 1 if nchw else -1
    c1 = jnp.maximum(conv(x, 32, 3, key=1, nchw=nchw), 0)
    r = c1
    for blk in range(6):
        inp = r
        h = r
        if blk:
            h = jnp.maximum(conv(h, 192, 1, key=10 + blk, nchw=nchw), 0)
        h = jnp.maximum(conv(h, h.shape[ax], 3, groups=h.shape[ax],
                             key=20 + blk, nchw=nchw), 0)
        h = conv(h, 32, 1, key=30 + blk, nchw=nchw)
        r = inp + h
    c2 = conv(r, 32, 3, key=2, nchw=nchw)
    return c2 + c1


def chained(nchw):
    @jax.jit
    def fn(x):
        def step(i, z):
            y = body(z + jnp.bfloat16(i) * jnp.bfloat16(1e-6), nchw=nchw)
            return conv(y, 3, 1, key=99, nchw=nchw)
        return jax.lax.fori_loop(0, REPS, step, x)
    return fn


def timeit(fn, xs, n=4, label=""):
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
    base = [rng.standard_normal((N, H, W, 3)) * 0.5 for _ in range(2)]
    xs = [jnp.asarray(b, jnp.bfloat16) for b in base]
    xs_t = [jnp.asarray(b.transpose(0, 3, 1, 2), jnp.bfloat16) for b in base]

    timeit(chained(False), xs, label="body NHWC (chained)")
    timeit(chained(True), xs_t, label="body NCHW (chained)")


if __name__ == "__main__":
    main()
