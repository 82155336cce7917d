#!/usr/bin/env python
"""Ablate the fused tail kernel stage by stage to locate its cost
(PERF.md r2).  Stages: dma -> up1 -> rolls -> up2 -> x3build -> full.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tail_ablate.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denoise_gan_tpu.models.fsrgan import FSRGANTail
from denoise_gan_tpu.ops.pallas.tail import (
    CIN, CORE, T, make_h3b, prep_weights,
)


def _dot_kn(w, x):
    return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def kernel(h3_ref, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref,
           w3_ref, b3_ref, out_ref, x1, u1, u1r, x2, r_buf, x3,
           brc: int, stage: int):
    m1 = (brc + 4) * 128
    m2 = (brc + 2) * 128
    m3 = brc * 128

    if stage >= 1:
        for dr in range(3):
            for dc in range(3):
                x1[(dr * 3 + dc) * CIN:(dr * 3 + dc + 1) * CIN, :] = \
                    h3_ref[0, 0, dc, :, dr * 128:dr * 128 + m1]
        v = _dot_kn(w1_ref[:], x1[:]) + b1_ref[:]
        u1[:] = jnp.where(v >= 0, v, a1_ref[:] * v)
    if stage >= 2:
        u1r[0] = pltpu.roll(u1[:], m1 - 1, 1).astype(jnp.bfloat16)
        u1r[1] = pltpu.roll(u1[:], m1 - 2, 1).astype(jnp.bfloat16)
    if stage >= 3:
        for a in range(2):
            for du_idx in range(3):
                app = a + du_idx - 1
                a_src, cyu = app & 1, (app - (app & 1)) // 2
                for l in range(4):
                    dvp = l - 1
                    b_src, cxu = dvp & 1, (dvp - (dvp & 1)) // 2
                    s = cxu + 1
                    blk = (a_src * 2 + b_src) * CIN
                    off = (cyu + 1) * 128
                    k0 = (du_idx * 4 + l) * CIN
                    if s == 0:
                        x2[k0:k0 + CIN, :] = u1[blk:blk + CIN,
                                                off:off + m2].astype(jnp.bfloat16)
                    else:
                        x2[k0:k0 + CIN, :] = u1r[s - 1, blk:blk + CIN,
                                                 off:off + m2]
            for a2i in range(2):
                v = _dot_kn(w2_ref[a, a2i], x2[:]) + b2_ref[a2i]
                r_buf[2 * a + a2i] = jnp.where(v >= 0, v, a2_ref[:] * v)
    if stage >= 4:
        for rho in range(-1, 5):
            e, cy = rho & 3, (rho - (rho & 3)) // 4
            off = (cy + 1) * 128
            for kap in range(-1, 5):
                f, cxf = kap & 3, (kap - (kap & 3)) // 4
                k0 = ((rho + 1) * 6 + (kap + 1)) * CIN
                src = r_buf[e, f * CIN:(f + 1) * CIN, off:off + m3]
                if cxf:
                    src = pltpu.roll(src, (-cxf) % m3, 1)
                x3[k0:k0 + CIN, :] = src.astype(jnp.bfloat16)
    if stage >= 5:
        res = jax.lax.dot_general(x3[:], w3_ref[:], (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        res = jnp.tanh(res + b3_ref[:])
        out_ref[:, 0] = res.astype(jnp.bfloat16).reshape(brc, 128, 48)
    else:
        # constant output; the stage work persists through stateful scratch
        # writes (verified: stage times differ, so nothing was DCE'd)
        out_ref[:, 0] = jnp.zeros((brc, 128, 48), jnp.bfloat16)


def build(weights, ny, nx, brc, stage):
    bands = CORE // brc
    m1, m2, m3 = (brc + 4) * 128, (brc + 2) * 128, brc * 128
    args = [jnp.asarray(weights["W1m"], jnp.bfloat16),
            jnp.asarray(weights["b1"], jnp.float32),
            jnp.asarray(weights["alpha1"], jnp.float32),
            jnp.asarray(weights["W2p"], jnp.bfloat16),
            jnp.asarray(weights["b2n"], jnp.float32),
            jnp.asarray(weights["alpha2"], jnp.float32),
            jnp.asarray(weights["W3p"], jnp.bfloat16),
            jnp.asarray(weights["b3"], jnp.float32)]
    call = pl.pallas_call(
        functools.partial(kernel, brc=brc, stage=stage),
        grid=(ny * nx, bands),
        in_specs=[pl.BlockSpec((1, 1, 3, CIN, (brc + 6) * 128),
                               lambda n, b: (n, b, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(
            (brc, 1, 128, 48),
            lambda n, b, nx=nx, bands=bands: (n // nx * bands + b,
                                              n % nx, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny * CORE, nx, 128, 48),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((9 * CIN, m1), jnp.bfloat16),
            pltpu.VMEM((128, m1), jnp.float32),
            pltpu.VMEM((2, 128, m1), jnp.bfloat16),
            pltpu.VMEM((12 * CIN, m2), jnp.bfloat16),
            pltpu.VMEM((4, 128, m2), jnp.float32),
            pltpu.VMEM((36 * CIN, m3), jnp.bfloat16),
        ],
    )
    return jax.jit(lambda h3b: call(h3b, *args))


def main():
    ny, nx, brc = 9, 16, 12
    tail = FSRGANTail()
    params = tail.init(jax.random.key(0),
                       jnp.zeros((1, T, T, 32), jnp.float32))["params"]
    weights = prep_weights(params)
    rng = np.random.default_rng(0)
    hs = [make_h3b(jnp.asarray(rng.standard_normal((ny * nx, T, T, 32)) * 0.5,
                               jnp.bfloat16), brc) for _ in range(2)]
    jax.block_until_ready(hs)

    for stage, name in [(0, "dma only"), (1, "+X1/up1"), (2, "+rolls"),
                        (3, "+X2/up2"), (4, "+X3 build"), (5, "full")]:
        fn = build(weights, ny, nx, brc, stage)
        fn(hs[0]).block_until_ready()
        t0 = time.time()
        out = None
        for i in range(24):
            out = fn(hs[i % 2])
        out.block_until_ready()
        dt = (time.time() - t0) / 24 * 1000
        print(f"stage {stage} ({name}): {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
