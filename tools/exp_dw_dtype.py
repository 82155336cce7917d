#!/usr/bin/env python
"""XLA depthwise dtype probe: is the VPU faster on f32 (native) than bf16
(unpack/pack) for the 3x3 dw @192 at production geometry?  Chained in-program
reps + scalar fetch (block_until_ready lies through the tunnel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_dw_dtype.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 12
N, H, W, C = 128, 139, 124, 192


def chained(in_dt, w_dt, acc_dt):
    w = (jax.random.normal(jax.random.key(1), (3, 3, 1, C), w_dt)
         * jnp.asarray(0.1, w_dt))

    @jax.jit
    def fn(x):
        def step(i, z):
            z = z + jnp.asarray(i, in_dt) * jnp.asarray(1e-6, in_dt)
            y = jax.lax.conv_general_dilated(
                z, w, (1, 1), "SAME", feature_group_count=C,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dt)
            return jnp.maximum(y, 0).astype(in_dt)
        return jax.lax.fori_loop(0, REPS, step, x)
    return fn


def timeit(fn, xs, n=4, label=""):
    fetch = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(fetch(fn(xs[0])))
    t0 = time.time()
    for i in range(n):
        float(fetch(fn(xs[i % 2])))
    dt = (time.time() - t0) / n / REPS * 1000
    gf = 2 * 9 * N * H * W * C / 1e9
    print(f"{label}: {dt:.2f} ms ({gf/dt*1000:.2f} TF/s)", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    base = [rng.standard_normal((N, H, W, C)) * 0.5 for _ in range(2)]
    for in_dt, w_dt, acc_dt, label in [
        (jnp.bfloat16, jnp.bfloat16, jnp.bfloat16, "bf16/bf16/bf16"),
        (jnp.float32, jnp.float32, jnp.float32, "f32/f32/f32"),
        (jnp.bfloat16, jnp.bfloat16, jnp.float32, "bf16 in, f32 acc"),
    ]:
        xs = [jnp.asarray(b, in_dt) for b in base]
        timeit(chained(in_dt, w_dt, acc_dt), xs, label=label)


if __name__ == "__main__":
    main()
