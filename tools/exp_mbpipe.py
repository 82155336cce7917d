#!/usr/bin/env python
"""In-kernel inverted-residual band-pipeline microbench (fused-body design
probe).  One band step in the transposed layout (channels on sublanes,
space as 128-lane chunks):

  expand: dot (32,192)^T x r(32, 17*128) -> E (192, 17*128) f32, +bias, relu
  rolls:  E_l/E_r lane-rotated copies (f32)
  dw:     9 shifted FMAs with (192,1) per-channel weight broadcasts -> D
  project: dot (192,32)^T x relu(D+b) -> (32, 15*128) + residual -> r

Variants: 1 chain (serial dependence = no MXU/VPU overlap) vs 2 independent
chains interleaved (pipeline steady-state: chain A's matmuls overlap chain
B's dw).  Scale to a frame: 128 tiles x ceil(139/15)=10 bands x 6 blocks
x t_step (minus the last band's partial rows; ~7100 steps/frame).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_mbpipe.py [reps]
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

MB = 17 * 128       # expand band (15 core rows + 2 halo chunks)
MP = 15 * 128       # project band


def _iota2(shape, dim, scale):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32) * scale


def _kernel(o_ref, r1, r2, e_buf, el, er, d_buf, we, wp, wdw, reps: int,
            chains: int):
    r1[:] = _iota2((32, MB), 1, 1e-5).astype(jnp.bfloat16)
    r2[:] = (_iota2((32, MB), 1, 1e-5) + 0.5).astype(jnp.bfloat16)
    we[:] = (_iota2((32, 192), 0, 1e-3) - _iota2((32, 192), 1, 1e-3)
             ).astype(jnp.bfloat16)
    wp[:] = (_iota2((192, 32), 1, 1e-3) - _iota2((192, 32), 0, 1e-3)
             ).astype(jnp.bfloat16)
    wdw[:] = _iota2((9, 192, 1), 1, 1e-4)

    def block_step(r_ref, slot):
        # expand (MXU, K=32) + bias/relu (VPU)
        e = jax.lax.dot_general(
            we[:], r_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (192, MB)
        e_buf[slot] = jnp.maximum(e + 0.01, 0.0)
        # column-tap rolled copies (f32)
        el[slot] = pltpu.roll(e_buf[slot], 1, 1)
        er[slot] = pltpu.roll(e_buf[slot], MB - 1, 1)
        # dw: 9 shifted FMAs, aligned chunk-offset slices
        acc = jnp.zeros((192, MP), jnp.float32)
        for dr in range(3):
            off = dr * 128
            for dc, src in enumerate((el, e_buf, er)):
                acc = acc + wdw[3 * dr + dc] * \
                    src[slot, :, off:off + MP]
        d_buf[slot] = jnp.maximum(acc + 0.01, 0.0)
        # project (MXU, K=192) + residual
        p = jax.lax.dot_general(
            wp[:], d_buf[slot], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (32, MP)
        r_ref[:, 128:128 + MP] = (
            r_ref[:, 128:128 + MP].astype(jnp.float32) + p * 1e-3
        ).astype(jnp.bfloat16)

    def step(k, c):
        block_step(r1, 0)
        if chains == 2:
            block_step(r2, 1)
        return c

    jax.lax.fori_loop(0, reps, step, 0)
    o_ref[:, :] = r1[0:8, 0:128].astype(jnp.float32) + \
        r2[0:8, 0:128].astype(jnp.float32)


def run(reps, chains):
    kern = functools.partial(_kernel, reps=reps, chains=chains)
    fn = jax.jit(pl.pallas_call(
        kern,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((32, MB), jnp.bfloat16),    # r1
            pltpu.VMEM((32, MB), jnp.bfloat16),    # r2
            pltpu.VMEM((2, 192, MB), jnp.float32),  # E
            pltpu.VMEM((2, 192, MB), jnp.float32),  # E rolled left
            pltpu.VMEM((2, 192, MB), jnp.float32),  # E rolled right
            pltpu.VMEM((2, 192, MP), jnp.float32),  # D
            pltpu.VMEM((32, 192), jnp.bfloat16),   # We
            pltpu.VMEM((192, 32), jnp.bfloat16),   # Wp
            pltpu.VMEM((9, 192, 1), jnp.float32),  # Wdw
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    ))
    float(jnp.sum(fn()))                      # warm (block_until_ready lies)
    t0 = time.time()
    n = 6
    for _ in range(n):
        s = float(jnp.sum(fn()))
    dt = (time.time() - t0) / n / reps * 1e6
    per_step = dt / chains
    frame_ms = per_step * 7119 / 1000        # 128 tiles * ~9.27 bands * 6
    print(f"chains={chains}: {per_step:.2f} us/block-band-step "
          f"(frame-equiv body ~{frame_ms:.1f} ms, checksum {s:.3f})",
          flush=True)
    return per_step


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    t1 = run(reps, 1)
    t2 = run(reps, 2)
    print(f"overlap gain: {t1 / t2:.2f}x")


if __name__ == "__main__":
    main()
