#!/usr/bin/env python
"""Mosaic depthwise-conv formulation shootout (fused-body design probe).

XLA's dw lowering achieves ~2.5 us per (192ch, 15x128-px) band-step
(17.5 ms/frame over 7119 steps).  The fused-body kernel needs a Mosaic
formulation in the same league.  Variants, all computing a 3x3 dw on a
(192, 17*128) f32 band -> (192, 15*128):

  scratch : pre-rolled E_l/E_r in VMEM scratch + 9 slice-FMAs  (exp_mbpipe)
  value   : single fused expression, rolls as values (compiler may fuse)
  chunked : fori over 128-lane output chunks, 3-vreg-window carry (register
            tiling; rolls on (192,128) chunks only)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_dw_forms.py [reps]
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

NCH = 192
MB = 17 * 128
MP = 15 * 128


def _iota2(shape, dim, scale):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32) * scale


def _dw_scratch(e_ref, el, er, d_ref, wdw):
    el[:] = pltpu.roll(e_ref[:], 1, 1)
    er[:] = pltpu.roll(e_ref[:], MB - 1, 1)
    acc = jnp.zeros((NCH, MP), jnp.float32)
    for dr in range(3):
        off = dr * 128
        for dc, src in enumerate((el, e_ref, er)):
            acc = acc + wdw[3 * dr + dc] * src[:, off:off + MP]
    return acc


def _dw_value(e_ref, el, er, d_ref, wdw):
    e = e_ref[:]
    srcs = (pltpu.roll(e, 1, 1), e, pltpu.roll(e, MB - 1, 1))
    acc = jnp.zeros((NCH, MP), jnp.float32)
    for dr in range(3):
        off = dr * 128
        for dc in range(3):
            acc = acc + wdw[3 * dr + dc] * srcs[dc][:, off:off + MP]
    return acc


def _dw_chunked(e_ref, el, er, d_ref, wdw):
    # register tiling: per output chunk, roll only (NCH,128) vreg blocks
    def chunk(j, c):
        c0, c1, c2 = (e_ref[:, pl.ds((j + d) * 128, 128)]
                      for d in range(3))
        # column taps via single-chunk rolls (lane +-1 within the chunk is
        # wrong at the chunk edge by 1 column; acceptable for a TIMING probe)
        out = jnp.zeros((NCH, 128), jnp.float32)
        for dr, cc in enumerate((c0, c1, c2)):
            out = out + wdw[3 * dr] * pltpu.roll(cc, 1, 1) \
                      + wdw[3 * dr + 1] * cc \
                      + wdw[3 * dr + 2] * pltpu.roll(cc, 127, 1)
        d_ref[:, pl.ds(j * 128, 128)] = out
        return c

    jax.lax.fori_loop(0, 15, chunk, 0)
    return None


def _dw_planes(e_ref, el, er, d_ref, wpl, wdw):
    # full (NCH, MP) weight planes: FMA is plain vreg*vreg (no broadcasts)
    el[:] = pltpu.roll(e_ref[:], 1, 1)
    er[:] = pltpu.roll(e_ref[:], MB - 1, 1)
    acc = jnp.zeros((NCH, MP), jnp.float32)
    for dr in range(3):
        off = dr * 128
        for dc, src in enumerate((el, e_ref, er)):
            acc = acc + wpl[3 * dr + dc] * src[:, off:off + MP]
    return acc


FORMS = {"scratch": _dw_scratch, "value": _dw_value, "chunked": _dw_chunked,
         "planes": _dw_planes}


def _kernel(o_ref, e_ref, el, er, d_ref, wpl, wdw, reps: int, form: str):
    e_ref[:] = _iota2((NCH, MB), 1, 1e-4) - _iota2((NCH, MB), 0, 1e-4)
    wdw[:] = _iota2((9, NCH, 1), 1, 1e-4) + 0.05
    for t in range(9):
        wpl[t] = _iota2((NCH, MP), 0, 1e-4) + 0.05

    fn = FORMS[form]

    def step(k, c):
        if form == "planes":
            d = fn(e_ref, el, er, d_ref, wpl, wdw)
        else:
            d = fn(e_ref, el, er, d_ref, wdw)
        if d is not None:
            d_ref[:] = d
        e_ref[:, 0:128] = d_ref[:, 0:128] * 1e-3   # dependency chain
        return c

    jax.lax.fori_loop(0, reps, step, 0)
    o_ref[:, :] = e_ref[0:8, 0:128]


def run(reps, form):
    kern = functools.partial(_kernel, reps=reps, form=form)
    fn = jax.jit(pl.pallas_call(
        kern,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NCH, MB), jnp.float32),
            pltpu.VMEM((NCH, MB), jnp.float32),
            pltpu.VMEM((NCH, MB), jnp.float32),
            pltpu.VMEM((NCH, MP), jnp.float32),
            pltpu.VMEM((9, NCH, MP), jnp.float32),
            pltpu.VMEM((9, NCH, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
    ))
    float(jnp.sum(fn()))                      # warm (block_until_ready lies)
    t0 = time.time()
    n = 6
    for _ in range(n):
        s = float(jnp.sum(fn()))
    dt = (time.time() - t0) / n / reps * 1e6
    print(f"{form}: {dt:.2f} us/band-step (frame dw ~"
          f"{dt * 7119 / 1000:.1f} ms, checksum {s:.3f})", flush=True)
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    for form in FORMS:
        run(reps, form)


if __name__ == "__main__":
    main()
