#!/usr/bin/env python
"""Probe: Mosaic uint8 vector stores + lane rolls on f32->u8 casts, and the
(M,48)->4x(M,12) eo-extraction pattern planned for the fused tail epilogue.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_u8_store.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, out_ref):
    res = x_ref[:]                                   # (1024, 48) f32
    u8 = jnp.clip((jnp.tanh(res) + 1.0) * 0.5, 0.0, 1.0) * 255.0 + 0.5
    for eo in range(4):
        v = u8 if eo == 0 else pltpu.roll(u8, (-12 * eo) % 48, 1)
        blk = v[:, 0:12].astype(jnp.uint8)           # (1024, 12)
        out_ref[:, eo] = blk.reshape(8, 128, 12)


def main():
    M, bands = 1024, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, 48)), jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 4, 128, 12), jnp.uint8),
    )(x)
    out = np.asarray(out)

    ref = np.clip((np.tanh(np.asarray(x)) + 1) * 0.5, 0, 1) * 255 + 0.5
    ref = ref.astype(np.uint8).reshape(8, 128, 4, 12).transpose(0, 2, 1, 3)
    print("u8 store + eo extract:",
          "OK" if np.array_equal(out, ref) else "MISMATCH",
          f"maxdiff={np.abs(out.astype(int) - ref.astype(int)).max()}")


if __name__ == "__main__":
    main()
