"""Fused Pallas FSRGAN tail: up1 -> up2 -> out_conv -> tanh -> crop-stitch,
one kernel, all intermediates VMEM-resident.

Replaces the XLA coarse tail + crop_stitch (infer/fast.py build_coarse_tail +
infer/engine.py crop_stitch) for fsrgan inference.  Numerically equivalent to
the plain FSRGANTail (models/fsrgan.py, /root/reference/fsrgan.py:178-218)
on every CORE pixel (the crop-stitch geometry consumes exactly the conv
halos, so no tile-edge SAME-pad case reaches the output — see tests).

Why a kernel: the XLA tail pays (a) 16x structural zeros in the m=4
scattered final conv (PERF.md), (b) an output-lane pad 48->128, and (c) HBM
round trips between stages.  Design notes (all slices tile-aligned):

* Activations live TRANSPOSED: (channels on sublanes, space on lanes), with
  space chunked as row-blocks of 128 lanes (tile width T=124, conv halo 2
  -> exactly 128 stored columns per row).  Channel-block selection is then
  a sublane slice (32-mult), row shifts are 128-mult lane slices, and the
  only misaligned ops are +-1 lane shifts done with pltpu.roll on f32.
* up1 is one K=288 matmul per band from 9 aligned slices of three
  dc-shifted h copies prepared in XLA (h3b) — no in-kernel transposes.
* up2 runs as 4 matmuls (row-phase a x channel-sub-phase a2), each K=384
  (3 row taps x the 4-column union window x 32ch), N=128, producing the
  four fine-row-phase buffers R_e directly (e = 2a + a2).
* the final 3x3 fine-space conv is ONE K=1152 matmul (6 fine rows x 6 fine
  cols x 32ch packed, zero structural waste in K) with N=48 output
  (eo,fo,c), emitted as (M, 48) so the 48 pads harmlessly on lanes.
* output is written directly into the crop-stitched canvas
  (ny*120, nx, 128, 48) bf16 — real columns at lane [3:123] of each
  128-chunk; the epilogue slice fuses into the downstream u8/flat pass.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 124          # coarse tile size; T + conv halo 4 == 128 lanes exactly
CORE = 120       # output rows/cols per tile (stride; overlap 4, margins 2)
CIN = 32


# ---------------------------------------------------------------------------
# weight preparation (host-side numpy)

def prep_weights(tail_params: Any) -> dict[str, np.ndarray]:
    """Pack the plain FSRGANTail params (models/fsrgan.py FSRGANTail) into
    the kernel's matmul forms."""
    up1 = tail_params["up1"]
    up2 = tail_params["up2"]
    out = tail_params["out_conv"]
    W1 = np.asarray(up1["Conv_0"]["kernel"], np.float32)   # (3,3,32,128)
    b1 = np.asarray(up1["Conv_0"]["bias"], np.float32)     # (128,)
    a1 = np.asarray(up1["PReLU_0"]["alpha"], np.float32)   # (32,)
    W2 = np.asarray(up2["Conv_0"]["kernel"], np.float32)   # (3,3,32,128)
    b2 = np.asarray(up2["Conv_0"]["bias"], np.float32)     # (128,)
    a2 = np.asarray(up2["PReLU_0"]["alpha"], np.float32)   # (32,)
    Wf = np.asarray(out["kernel"], np.float32)             # (3,3,32,3)
    bf = np.asarray(out["bias"], np.float32)               # (3,)

    # up1: K=(dr,dc,t) 288 -> N=o 128; PReLU alpha per post-d2s channel:
    # raw conv channel (a'*2+b')*32+t -> alpha1[t]
    W1m = W1.reshape(9 * CIN, 128)
    alpha1 = np.tile(a1, 4)                                # (128,)

    # up2: per (a, a2): K=(du,l,t) 384 -> N=(f,t2) 128
    W2p = np.zeros((2, 2, 12 * CIN, 128), np.float32)
    for a2i in range(2):
        for f in range(4):
            b, b2i = f >> 1, f & 1
            q0 = (a2i * 2 + b2i) * CIN
            for du in range(3):
                for l in range(4):
                    dv = (l - 1) - b                       # conv col tap
                    if not -1 <= dv <= 1:
                        continue
                    k0 = (du * 4 + l) * CIN
                    W2p[:, a2i, k0:k0 + CIN, f * CIN:(f + 1) * CIN] = \
                        W2[du, dv + 1, :, q0:q0 + CIN]
    # R_e channel n=(f,t2) -> conv channel q=(a2*2+(f&1))*32+t2
    b2n = np.zeros((2, 128), np.float32)
    for a2i in range(2):
        for f in range(4):
            b2n[a2i, f * CIN:(f + 1) * CIN] = b2[(a2i * 2 + (f & 1)) * CIN:
                                                 (a2i * 2 + (f & 1) + 1) * CIN]
    alpha2 = np.tile(a2, 4)                                # (128,) per t2

    # final: K=(rho,kappa,t2) 1152 -> N=(eo,fo,c) 48
    W3p = np.zeros((36 * CIN, 48), np.float32)
    for rho in range(-1, 5):
        for kap in range(-1, 5):
            k0 = ((rho + 1) * 6 + (kap + 1)) * CIN
            for eo in range(4):
                du = rho - eo
                if not -1 <= du <= 1:
                    continue
                for fo in range(4):
                    dv = kap - fo
                    if not -1 <= dv <= 1:
                        continue
                    n0 = (eo * 4 + fo) * 3
                    W3p[k0:k0 + CIN, n0:n0 + 3] = Wf[du + 1, dv + 1]

    return dict(
        W1m=W1m.astype(np.float32),
        b1=b1.reshape(128, 1),
        alpha1=alpha1.reshape(128, 1),
        W2p=W2p,
        b2n=b2n.reshape(2, 128, 1),
        alpha2=alpha2.reshape(128, 1),
        W3p=W3p,
        b3=np.tile(bf, 16).reshape(1, 48),   # per (eo,fo,c) col: bf[c]
    )


# ---------------------------------------------------------------------------
# XLA-side input prep

def make_h3b(h_tiles: jax.Array, brc: int) -> jax.Array:
    """(N, T, T, 32) body output -> (N, bands, 3, 32, (brc+6)*128) bf16:
    zero-padded (conv SAME), dc-shifted x3, chunk-flattened per band.
    (v1 banded layout — kept for the per-band-grid kernel; duplicates the
    band halos, ~16 ms of XLA gather/transpose at 1080p.  The per-tile
    kernel uses make_h3 instead.)"""
    n = h_tiles.shape[0]
    bands = CORE // brc
    rows = brc + 6
    hp = jnp.pad(h_tiles.astype(jnp.bfloat16),
                 ((0, 0), (3, 3), (3, 3), (0, 0)))         # (N,130,130,32)
    ht = hp.transpose(0, 1, 3, 2)                          # (N,130,32,130)
    h3 = jnp.stack([ht[..., dc:dc + 128] for dc in range(3)],
                   axis=1)                                 # (N,3,130,32,128)
    idx = ((jnp.arange(bands) * brc)[:, None]
           + jnp.arange(rows)[None] + 2)                   # h_pad row of chunk
    hb = h3[:, :, idx]                                     # (N,3,bands,rows,32,128)
    hb = hb.transpose(0, 2, 1, 4, 3, 5)                    # (N,bands,3,32,rows,128)
    return hb.reshape(n, bands, 3, CIN, rows * 128)


def make_h3(h_tiles: jax.Array, prep: str = "transpose") -> jax.Array:
    """(N, T, T, 32) body output -> (N, 32, 130*128) bf16 chunk-flat, ONE
    copy: channel-major, rows as 128-lane chunks holding cols [-1, 127)
    (124 output cols only ever read cols [-1,126), so one 128-chunk covers
    every tap; the dc-shifts become two in-kernel lane rolls).

    The (px, ch) -> (ch, px) relayout is the expensive part on TPU; two
    producers are available:
    * 'transpose' — jnp.transpose (XLA relayout)
    * 'conv'      — 1x1 identity conv with NCHW output layout (the conv
      emitter performs the relayout; measured faster, PERF.md r2)
    The final (130,128)->(16640,) flatten is layout-free because the minor
    dim is exactly one lane-tile wide."""
    n = h_tiles.shape[0]
    hb = h_tiles.astype(jnp.bfloat16)
    hp = jnp.pad(hb, ((0, 0), (3, 3), (1, 3), (0, 0)))     # (N,130,128,32)
    if prep == "conv":
        eye = jnp.eye(CIN, dtype=jnp.bfloat16).reshape(1, 1, CIN, CIN)
        ht = jax.lax.conv_general_dilated(
            hp, eye, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))    # (N,32,130,128)
    else:
        ht = hp.transpose(0, 3, 1, 2)                      # (N,32,130,128)
    return ht.reshape(n, CIN, (T + 6) * 128)


# ---------------------------------------------------------------------------
# kernel

def _dot_kn(w, x):
    """(K, N) x (K, M) -> (N, M), f32 accumulate."""
    return jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tail_kernel(h3_hbm, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref,
                 w3_ref, b3_ref, out_ref,
                 h3, hroll, x1, u1, u1r, x2, r_buf, x3, sem, brc: int):
    """One grid step = one tile; internal fori_loop over row bands (keeps
    VMEM bounded without duplicating band halos in HBM).

    Lane conventions (within each 128-lane row chunk):
      h: lane = col + 1 (cols [-1, 127));  U1: lane = col (cols [0, 124));
      U2/R_e/X3: lane = col + 1;  output: lane = col + 1 -> real [3:123)."""
    m1 = (brc + 4) * 128
    m2 = (brc + 2) * 128
    m3 = brc * 128
    bands = CORE // brc
    lh = (T + 6) * 128

    n = pl.program_id(0)
    cp = pltpu.make_async_copy(h3_hbm.at[n], h3, sem)
    cp.start()
    cp.wait()
    # dc column taps as whole-tile lane shifts: X1[l=col] = h[col+dc-1]
    # = h_lane(l + dc); roll(x, L-s): out[l] = in[l+s]
    hf = h3[:].astype(jnp.float32)
    hroll[0] = pltpu.roll(hf, lh - 1, 1).astype(jnp.bfloat16)
    hroll[1] = pltpu.roll(hf, lh - 2, 1).astype(jnp.bfloat16)

    def band(b, carry):
        base = b * brc + 2     # h_pad row chunk of U1 row 0 (dr=0)

        # ---- up1: X1 (288, M1) <- 9 aligned slices of h / rolled h
        for dr in range(3):
            off1 = pl.multiple_of((base + dr) * 128, 128)
            for dc in range(3):
                src = h3 if dc == 0 else hroll.at[dc - 1]
                x1[(dr * 3 + dc) * CIN:(dr * 3 + dc + 1) * CIN, :] = \
                    src[:, pl.ds(off1, m1)]
        v = _dot_kn(w1_ref[:], x1[:]) + b1_ref[:]          # (128, M1)
        u1[:] = jnp.where(v >= 0, v, a1_ref[:] * v)        # PReLU, f32
        # up2 column taps: X2[l=j+1] = U1[lane j+cx] = U1[l + cx - 1];
        # shifts cx-1 in {-2,-1,0}: roll(x, k): out[l] = in[l-k]
        u1r[0] = pltpu.roll(u1[:], 1, 1).astype(jnp.bfloat16)
        u1r[1] = pltpu.roll(u1[:], 2, 1).astype(jnp.bfloat16)

        # ---- up2: per row-phase a, one shared X2 (384, M2); 2 matmuls (a2)
        for a in range(2):
            for du_idx in range(3):
                app = a + du_idx - 1
                a_src, cyu = app & 1, (app - (app & 1)) // 2
                for l in range(4):
                    dvp = l - 1
                    b_src, cxu = dvp & 1, (dvp - (dvp & 1)) // 2
                    blk = (a_src * 2 + b_src) * CIN
                    off = (cyu + 1) * 128
                    k0 = (du_idx * 4 + l) * CIN
                    if cxu == 1:        # shift 0: U1 direct
                        x2[k0:k0 + CIN, :] = \
                            u1[blk:blk + CIN,
                               off:off + m2].astype(jnp.bfloat16)
                    else:               # shift cxu-1 in {-1,-2}
                        x2[k0:k0 + CIN, :] = u1r[-cxu, blk:blk + CIN,
                                                 off:off + m2]
            for a2i in range(2):
                v2 = _dot_kn(w2_ref[a, a2i], x2[:]) + b2_ref[a2i]
                r_buf[2 * a + a2i] = jnp.where(
                    v2 >= 0, v2, a2_ref[:] * v2).astype(jnp.bfloat16)

        # ---- final: X3 (1152, M3) packed from the R_e buffers
        for rho in range(-1, 5):
            e, cy = rho & 3, (rho - (rho & 3)) // 4
            off = (cy + 1) * 128
            for kap in range(-1, 5):
                f, cxf = kap & 3, (kap - (kap & 3)) // 4
                k0 = ((rho + 1) * 6 + (kap + 1)) * CIN
                src = r_buf[e, f * CIN:(f + 1) * CIN, off:off + m3]
                if cxf:
                    # bf16 rotates are rejected; roll in f32
                    src = pltpu.roll(src.astype(jnp.float32),
                                     (-cxf) % m3, 1)
                x3[k0:k0 + CIN, :] = src.astype(jnp.bfloat16)

        res = jax.lax.dot_general(
            x3[:], w3_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (M3, 48)
        res = jnp.tanh(res + b3_ref[:])
        out_ref[pl.ds(b * brc, brc), 0] = \
            res.astype(jnp.bfloat16).reshape(brc, 128, 48)
        return carry

    jax.lax.fori_loop(0, bands, band, 0)


def build_tail_call(weights: dict[str, np.ndarray], ny: int, nx: int,
                    brc: int = 8, interpret: bool = False):
    """Returns fn(h3 (N, 32, (T+6)*128) bf16) ->
    canvas (ny*CORE, nx, 128, 48) bf16 (real cols at [3:123])."""
    assert CORE % brc == 0
    n_tiles = ny * nx
    m1, m2, m3 = (brc + 4) * 128, (brc + 2) * 128, brc * 128

    w1 = jnp.asarray(weights["W1m"], jnp.bfloat16)
    b1 = jnp.asarray(weights["b1"], jnp.float32)
    a1 = jnp.asarray(weights["alpha1"], jnp.float32)
    w2 = jnp.asarray(weights["W2p"], jnp.bfloat16)
    b2 = jnp.asarray(weights["b2n"], jnp.float32)
    a2 = jnp.asarray(weights["alpha2"], jnp.float32)
    w3 = jnp.asarray(weights["W3p"], jnp.bfloat16)
    b3 = jnp.asarray(weights["b3"], jnp.float32)

    kernel = functools.partial(_tail_kernel, brc=brc)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),    # h3 stays in HBM; manual DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),   # W1m
        pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
        pl.BlockSpec(memory_space=pltpu.VMEM),   # alpha1
        pl.BlockSpec(memory_space=pltpu.VMEM),   # W2p
        pl.BlockSpec(memory_space=pltpu.VMEM),   # b2n
        pl.BlockSpec(memory_space=pltpu.VMEM),   # alpha2
        pl.BlockSpec(memory_space=pltpu.VMEM),   # W3p
        pl.BlockSpec(memory_space=pltpu.VMEM),   # b3
    ]
    out_spec = pl.BlockSpec(
        (CORE, 1, 128, 48),
        lambda n, nx=nx: (n // nx, n % nx, 0, 0),
        memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((ny * CORE, nx, 128, 48),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((CIN, (T + 6) * 128), jnp.bfloat16),     # h3 tile
            pltpu.VMEM((2, CIN, (T + 6) * 128), jnp.bfloat16),  # h rolled
            pltpu.VMEM((9 * CIN, m1), jnp.bfloat16),       # X1
            pltpu.VMEM((128, m1), jnp.float32),            # U1
            pltpu.VMEM((2, 128, m1), jnp.bfloat16),        # U1 rolled
            pltpu.VMEM((12 * CIN, m2), jnp.bfloat16),      # X2
            pltpu.VMEM((4, 128, m2), jnp.bfloat16),        # R_e
            pltpu.VMEM((36 * CIN, m3), jnp.bfloat16),      # X3
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )

    def run(h3):
        return call(h3, w1, b1, a1, w2, b2, a2, w3, b3)

    return run


def build_fused_tail(tail_params: Any, ny: int, nx: int, brc: int = 8,
                     interpret: bool = False, prep: str = "transpose"):
    """fn(h_tiles (ny*nx, T, T, 32)) -> (ny*CORE, nx*CORE, 48) bf16 [-1,1]
    phase-canonical crop-stitched canvas."""
    weights = prep_weights(tail_params)
    call = build_tail_call(weights, ny, nx, brc, interpret=interpret)

    def run(h_tiles):
        canvas = call(make_h3(h_tiles, prep))
        return canvas[:, :, 3:123, :].reshape(ny * CORE, nx * CORE, 48)

    return run
