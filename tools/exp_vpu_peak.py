#!/usr/bin/env python
"""Microbench: VPU FMA peak, roll overhead, and MXU matmul throughput at the
tail/body kernel shapes (PERF.md r2).

Timing uses CHAINED dispatches (each iteration's input depends on the
previous output) — rotating a small set of inputs is NOT enough: the axon
runtime elides repeats aggressively (a 'pure FMA' loop measured an
impossible 16.8 TF/s before chaining).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_vpu_peak.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_chained(fn, x0, n=32, label="", flops=0.0):
    """fn: x -> same-shaped x. Chains n dispatches."""
    x = fn(x0)
    jax.block_until_ready(x)  # compile
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1000:.3f} ms  {flops/dt/1e12:.2f} TF/s", flush=True)


ITERS = 256


def fma_kernel(x_ref, o_ref):
    c1 = jnp.float32(1.000001)
    c2 = jnp.float32(1e-7)

    def body(_, acc):
        return acc * c1 + c2

    o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


def roll_fma_kernel(x_ref, o_ref):
    c1 = jnp.float32(0.999999)

    def body(_, acc):
        return acc + pltpu.roll(acc, 1, 1) * c1

    o_ref[:] = jax.lax.fori_loop(0, ITERS // 2, body, x_ref[:])


def main():
    rng = np.random.default_rng(0)
    shape = (512, 1024)
    x0 = jnp.asarray(rng.standard_normal(shape) * 1e-3, jnp.float32)

    f = jax.jit(lambda x: pl.pallas_call(
        fma_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    time_chained(f, x0, label="VPU pure FMA f32 (chained)",
                 flops=shape[0] * shape[1] * ITERS * 2)

    g = jax.jit(lambda x: pl.pallas_call(
        roll_fma_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    # per iter: one roll + one FMA over the block; count FMA flops only
    time_chained(g, x0, label="VPU roll+FMA f32 (chained)",
                 flops=shape[0] * shape[1] * (ITERS // 2) * 2)

    # MXU shapes (bf16), chained via a tiny feedback term.
    # form A: (M,K)@(K,N) canonical;  form B: dot_general((K,N),(K,M))
    # contracting sublanes of both (the fused-tail kernel's form).
    for (M, K, N) in [(2560, 128, 128), (2560, 384, 128), (2560, 1152, 128),
                      (2560, 1152, 48), (8192, 512, 512)]:
        b = jnp.asarray(rng.standard_normal((K, N)) * 0.01, jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.01, jnp.bfloat16)

        @jax.jit
        def step(x, b=b):
            y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return x + (jnp.sum(y) * 1e-20).astype(x.dtype)

        time_chained(step, x0, label=f"MXU A bf16 {M}x{K}x{N} (chained)",
                     flops=2 * M * K * N)

        xt0 = jnp.asarray(rng.standard_normal((K, M)) * 0.01, jnp.bfloat16)

        @jax.jit
        def step_t(x, b=b):
            y = jax.lax.dot_general(b, x, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return x + (jnp.sum(y) * 1e-20).astype(x.dtype)

        time_chained(step_t, xt0, label=f"MXU B bf16 {M}x{K}x{N} (chained)",
                     flops=2 * M * K * N)


if __name__ == "__main__":
    main()
