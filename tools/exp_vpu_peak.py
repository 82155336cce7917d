#!/usr/bin/env python
"""Microbench: VPU FMA peak, roll overhead, depthwise-pattern throughput,
and MXU matmul throughput at the tail kernel's shapes (PERF.md r2).

All loops rotate two distinct inputs (the runtime elides identical-buffer
repeats — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_vpu_peak.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, inputs, n=32, label="", flops=0.0):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(inputs[i % 2])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    tfs = flops / dt / 1e12
    print(f"{label}: {dt*1000:.3f} ms  {tfs:.2f} TF/s", flush=True)
    return tfs


ITERS = 256


def fma_kernel(x_ref, o_ref):
    acc = x_ref[:]
    c1 = jnp.float32(1.000001)
    c2 = jnp.float32(1e-7)
    for _ in range(ITERS):
        acc = acc * c1 + c2
    o_ref[:] = acc


def roll_fma_kernel(x_ref, o_ref):
    """Depthwise-ish pattern: per iteration one lane-roll + FMA."""
    acc = x_ref[:]
    c1 = jnp.float32(1.000001)
    for _ in range(ITERS // 8):
        r = acc
        for _ in range(8):
            r = pltpu.roll(r, 1, 1)
            acc = acc + r * c1
    o_ref[:] = acc


def dw9_kernel(x_ref, w_ref, o_ref):
    """3x3 depthwise on (rows, W*?) with major-dim row shifts and lane rolls
    for the column shifts: per output 9 FMA + 2 rolls."""
    rows = x_ref.shape[0] - 2
    w = w_ref[:]
    acc = None
    for dr in range(3):
        band = x_ref[pl.ds(dr, rows), :]  # aligned? dr=1,2 misaligned sublane
        for dc, sh in ((0, 1), (1, 0), (2, -1)):
            v = pltpu.roll(band, sh, 1) if sh else band
            term = v * w[dr, dc]
            acc = term if acc is None else acc + term
    o_ref[:] = acc


def main():
    rng = np.random.default_rng(0)
    shape = (512, 1024)
    xs = [jnp.asarray(rng.standard_normal(shape), jnp.float32)
          for _ in range(2)]

    f = jax.jit(lambda x: pl.pallas_call(
        fma_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    timeit(f, xs, label="VPU pure FMA f32",
           flops=shape[0] * shape[1] * ITERS * 2)

    g = jax.jit(lambda x: pl.pallas_call(
        roll_fma_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    timeit(g, xs, label="VPU roll+FMA f32",
           flops=shape[0] * shape[1] * ITERS * 2)

    # depthwise pattern on a (130, 1920) slab -> (128, 1920)
    dwshape = (130, 1920)
    dxs = [jnp.asarray(rng.standard_normal(dwshape), jnp.float32)
           for _ in range(2)]
    wk = jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)
    h = jax.jit(lambda x: pl.pallas_call(
        dw9_kernel,
        out_shape=jax.ShapeDtypeStruct((128, 1920), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, wk))
    timeit(h, dxs, label="VPU dw3x3 pattern f32",
           flops=128 * 1920 * 9 * 2)

    # MXU shapes of interest (bf16)
    for (M, K, N) in [(2880, 384, 128), (2880, 288, 128), (2880, 512, 128),
                      (2880, 512, 512), (2880, 1152, 128), (8192, 512, 512)]:
        a = [jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
             for _ in range(2)]
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        mm = jax.jit(lambda x, b=b: (x @ b).astype(jnp.bfloat16))
        timeit(mm, a, label=f"MXU bf16 {M}x{K}x{N}", flops=2 * M * K * N)


if __name__ == "__main__":
    main()
