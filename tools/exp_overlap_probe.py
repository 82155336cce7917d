#!/usr/bin/env python
"""Does Mosaic overlap MXU and VPU work inside one kernel?

Three kernels, each an in-kernel fori_loop (the only trustworthy timing
through the axon tunnel, CLAUDE.md): (a) a chained-matmul loop (pure MXU),
(b) a chained FMA+roll loop (pure VPU, mimicking a depthwise conv's shifted
FMAs), (c) both chains interleaved in one loop body (data-independent).

If t(c) ~= max(t(a), t(b)) the units overlap and a software-pipelined fused
body kernel can hide the dw VPU wall behind the expand/project/tail matmuls
(PERF.md: dw = 17.5 of the 23.4 ms body).  If t(c) ~= t(a)+t(b), Mosaic
serializes and the fused-body plan is dead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_overlap_probe.py [mxu_iters vpu_iters]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 15360          # lane extent of the working buffers


def _kernel(o_ref, y, z, mxu_iters: int, vpu_iters: int):
    # init
    y[:] = (jax.lax.broadcasted_iota(jnp.int32, (128, M), 1)
            .astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)
    z[:] = jax.lax.broadcasted_iota(jnp.int32, (8, M), 1).astype(
        jnp.float32) * 1e-4
    w = ((jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) -
          jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1))
         .astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)
    n_iter = max(mxu_iters, vpu_iters)

    def step(k, c):
        # MXU: full (128,128)x(128,M) dot each iter; only a 128x128 corner
        # is written back (keeps the dependency chain, negligible VPU cast)
        if mxu_iters:
            s = jax.lax.dot_general(
                w, y[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y[:, 0:128] = s[:, 0:128].astype(jnp.bfloat16)
        # VPU: dw-style shifted FMA on the whole (8, M) f32 buffer
        if vpu_iters:
            zv = z[:]
            z[:] = zv * 0.999 + pltpu.roll(zv, 1, 1) * 0.001
        return c

    jax.lax.fori_loop(0, n_iter, step, 0)
    o_ref[0:8, :] = y[0:8, 0:128].astype(jnp.float32) + z[:, 0:128]


def build(mxu_iters, vpu_iters):
    return pl.pallas_call(
        functools.partial(_kernel, mxu_iters=mxu_iters, vpu_iters=vpu_iters),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((128, M), jnp.bfloat16),
            pltpu.VMEM((8, M), jnp.float32),
        ],
    )


def run(mxu_iters, vpu_iters, label):
    fn = jax.jit(build(mxu_iters, vpu_iters))
    float(jnp.sum(fn()))                     # warm (block_until_ready lies)
    t0 = time.time()
    n = 8
    for _ in range(n):
        s = float(jnp.sum(fn()))
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.2f} ms (checksum {s:.4f})", flush=True)
    return dt


def main():
    mi = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    vi = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    ta = run(mi, 0, f"MXU only ({mi} chained 128x128x{M} matmuls)")
    tb = run(0, vi, f"VPU only ({vi} chained roll+FMA on (8,{M}) f32)")
    tc = run(mi, vi, "interleaved")
    print(f"sum={ta+tb:.2f} max={max(ta,tb):.2f} measured={tc:.2f}")


if __name__ == "__main__":
    main()
