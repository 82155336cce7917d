#!/usr/bin/env python
"""Does int8 double MXU throughput in Mosaic on this v5e chip?

The XLA-level w8a8 probes (tools/exp_int8_probe.py) measured ~1.0-1.1x vs
bf16 — either XLA never lowers s8xs8->s32 dots to the native int8 MXU path,
or the probe programs were not MXU-bound.  This probe asks the hardware
directly: chained in-kernel dots (the only trustworthy timing through the
tunnel), bf16 vs int8 at the tail kernel's contraction depths.

Each kernel: fori_loop of `iters` dependent (K,128)x(K,M) dots; the result
is written back into the operand slab so the chain is data-dependent.
int8 variant requantizes with a cheap shift so the loop stays i8.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int8_mosaic.py
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

M = 3840
ITERS = 2000


def _kernel_bf16(o_ref, y, K: int, iters: int):
    y[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, M), 1)
            .astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)
    w = ((jax.lax.broadcasted_iota(jnp.int32, (K, 128), 0)
          - jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1))
         .astype(jnp.float32) * 1e-3).astype(jnp.bfloat16)

    def step(k, c):
        s = jax.lax.dot_general(w, y[:], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (128,M)
        y[0:128, :] = s.astype(jnp.bfloat16)
        return c

    jax.lax.fori_loop(0, iters, step, 0)
    o_ref[:] = y[0:8, 0:128].astype(jnp.float32)


def _kernel_i8(o_ref, y, K: int, iters: int):
    y[:] = (jax.lax.broadcasted_iota(jnp.int32, (K, M), 1)
            % 127).astype(jnp.int8)
    w = ((jax.lax.broadcasted_iota(jnp.int32, (K, 128), 0)
          - jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1))
         % 125).astype(jnp.int8)

    def step(k, c):
        s = jax.lax.dot_general(w, y[:], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)   # (128,M)
        y[0:128, :] = jnp.clip(s >> 8, -127, 127).astype(jnp.int8)
        return c

    jax.lax.fori_loop(0, iters, step, 0)
    o_ref[:] = y[0:8, 0:128].astype(jnp.float32)


def run(kernel, K, dtype, label, iters=ITERS):
    call = pl.pallas_call(
        functools.partial(kernel, K=K, iters=iters),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, M), dtype)],
    )
    fn = jax.jit(call)
    try:
        float(jnp.sum(fn()))
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED — {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return None
    t0 = time.time()
    n = 6
    for _ in range(n):
        s = float(jnp.sum(fn()))
    dt = (time.time() - t0) / n * 1000
    gf = 2 * K * 128 * M * iters / 1e9
    print(f"{label}: {dt:.2f} ms  ({gf/dt:.0f} T/s, checksum {s:.1f})",
          flush=True)
    return dt


def main():
    for K in ([int(a) for a in sys.argv[1:]] or [128, 384, 1152]):
        tb = run(_kernel_bf16, K, jnp.bfloat16, f"bf16 K={K} chained dots")
        ti = run(_kernel_i8, K, jnp.int8, f"i8   K={K} chained dots")
        if tb and ti:
            print(f"   => i8 speedup {tb/ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
