#!/usr/bin/env python
"""Measure the relayout/transpose costs that gate the fused tail kernel
(PERF.md r2):

A. XLA transpose (N,130,130,32)->(N,130,32,130)  [h-prep core, 425MB class]
B. XLA transpose of a 128-channel tensor's minor dims [U1-prep class]
C. XLA pad+slice+stack only (prep minus transposes)
D. in-kernel MXU throughput by dot_general form, measured with an internal
   fori_loop (beats both the runtime's repeat-elision and dispatch latency)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_relayout.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, inputs, n=24, label=""):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(inputs[i % 2])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


REPS = 64


def mm_kernel(x_ref, w_ref, o_ref, form: str):
    def body(_, acc):
        if form == "canonical":     # (M,K)@(K,N), K on lhs lanes
            y = jax.lax.dot_general(x_ref[:], w_ref[:],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:                        # (K,N)x(K,M): contract sublanes of both
            y = jax.lax.dot_general(w_ref[:], x_ref[:],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return acc + y[0, 0]

    o_ref[0, 0] = jax.lax.fori_loop(0, REPS, body, jnp.float32(0))


def bench_mm(rng, M, K, N, form):
    if form == "canonical":
        x = jnp.asarray(rng.standard_normal((M, K)) * .01, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * .01, jnp.bfloat16)
    else:
        x = jnp.asarray(rng.standard_normal((K, M)) * .01, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * .01, jnp.bfloat16)
    xs = [x, x + jnp.bfloat16(1e-3)]
    call = pl.pallas_call(
        functools.partial(mm_kernel, form=form),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    f = jax.jit(lambda a: call(a, w))
    dt = timeit(f, xs, n=8, label=f"  {form} {M}x{K}x{N} ({REPS} reps)")
    tfs = 2 * M * K * N * REPS / (dt / 1e3) / 1e12
    print(f"    -> {tfs:.1f} TF/s", flush=True)


def trans_kernel(x_ref, o_ref, reps: int):
    def body(_, acc):
        t = jnp.swapaxes(acc, 0, 1)
        return jnp.swapaxes(t, 0, 1) + jnp.float32(0)

    o_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])


def main():
    rng = np.random.default_rng(0)
    N = 144

    # A: current h-prep transpose class
    hs = [jnp.asarray(rng.standard_normal((N, 130, 130, 32)), jnp.bfloat16)
          for _ in range(2)]
    timeit(jax.jit(lambda h: h.transpose(0, 1, 3, 2) + jnp.bfloat16(0)), hs,
           label="A: XLA transpose (144,130,130,32)->(...,32,130)")

    # B: 128-channel minor transpose class
    us = [jnp.asarray(rng.standard_normal((N, 128, 128, 128)), jnp.bfloat16)
          for _ in range(2)]
    timeit(jax.jit(lambda u: u.transpose(0, 1, 3, 2) + jnp.bfloat16(0)), us,
           label="B: XLA transpose (144,128,128,128) minor swap")

    # C: prep minus transposes (pad + 3 slices + stack)
    hraw = [jnp.asarray(rng.standard_normal((N, 124, 124, 32)), jnp.bfloat16)
            for _ in range(2)]

    def prep_not(h):
        hp = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)))
        return jnp.stack([hp[:, :, dc:dc + 128] for dc in range(3)], 1)

    timeit(jax.jit(prep_not), hraw, label="C: pad+slice+stack only")

    # D: MXU forms (in-kernel looped)
    print("D: MXU dot_general forms:", flush=True)
    for (M, K, Nn) in [(2048, 384, 128), (2048, 1152, 128), (1024, 1152, 48)]:
        for form in ("canonical", "sublane"):
            bench_mm(rng, M, K, Nn, form)

    # E: in-kernel 2D transpose (1536,128)->(128,1536) f32, looped
    x = jnp.asarray(rng.standard_normal((1536, 128)), jnp.float32)

    def tk(x_ref, o_ref):
        def body(_, acc):
            t = jnp.swapaxes(acc, 0, 1) * jnp.float32(1.000001)
            return jnp.swapaxes(t, 0, 1)

        o_ref[:] = jax.lax.fori_loop(0, 8, body, x_ref[:])  # 16 transposes

    call = pl.pallas_call(
        tk, out_shape=jax.ShapeDtypeStruct((1536, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    try:
        timeit(jax.jit(call), [x, x + 1], n=8,
               label="E: in-kernel 2x swapaxes (1536,128) f32")
    except Exception as e:
        print(f"E: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
