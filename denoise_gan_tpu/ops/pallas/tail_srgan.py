"""Fused Pallas SRGAN tail: up1 -> up2 -> 1x1 out_conv -> tanh ->
crop-stitch, one kernel, all intermediates VMEM-resident.

SRGAN sibling of ops/pallas/tail.py (the FSRGAN kernel), numerically
equivalent to the plain SRGANTail (models/srgan.py,
/root/reference/srgan.py:179-183) on every core pixel.  Same engine
geometry (tile width 124, col stride 120, coarse conv halo 2), same u8
epilogue and output contract; the differences:

* CIN=64 channels (fsrgan: 32): up1 is one K=576 matmul to N=256, with
  N on SUBLANES (256 = 2 MXU row-tiles, no pad waste).
* up2 is B-SPLIT: for CIN=64 splitting the column-phase b gives exactly
  N=128 (2 sub-phases x 64ch) with K=576 of fully-useful taps — the
  fsrgan kernel's shared-X2 form (K-union waste 1.33x) is not needed.
  8 matmuls per band: (a row-phase x b col-phase x a2 sub-row-phase).
* the final conv is 1x1 (fsrgan: 3x3): X3 is 16 aligned slice-copies of
  the R phase buffers (no lane rolls, no row halo) and W3p (1024, 48) is
  block-diagonal over the 16 fine phases.

Phase conventions (matching ops/image.py depth_to_space, d2s channel
p = dy*2 + dx): fine row e = 2a + a2, fine col f = 2b + b2; up1 raw
channel (p1, t) with p1 = a*2 + b; up2 raw channel (p2, t2) with
p2 = a2*2 + b2.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denoise_gan_tpu.ops.pallas.tail import (
    CORE, T, calibrate_h_scales, calibrate_tail_scales, make_h3, make_h3_q8,
)

CIN = 64


# ---------------------------------------------------------------------------
# weight preparation (host-side numpy)

def prep_weights_srgan(tail_params: Any,
                       bgr: bool = False) -> dict[str, np.ndarray]:
    """Pack the plain SRGANTail params (models/srgan.py) into the kernel's
    matmul forms.  bgr=True: permute the u8 epilogue selection to emit BGR
    byte order (see tail.py prep_weights)."""
    up1 = tail_params["up1"]
    up2 = tail_params["up2"]
    out = tail_params["out_conv"]
    W1 = np.asarray(up1["Conv_0"]["kernel"], np.float32)   # (3,3,64,256)
    b1 = np.asarray(up1["Conv_0"]["bias"], np.float32)     # (256,)
    a1 = np.asarray(up1["PReLU_0"]["alpha"], np.float32)   # (64,)
    W2 = np.asarray(up2["Conv_0"]["kernel"], np.float32)   # (3,3,64,256)
    b2 = np.asarray(up2["Conv_0"]["bias"], np.float32)     # (256,)
    a2 = np.asarray(up2["PReLU_0"]["alpha"], np.float32)   # (64,)
    Wf = np.asarray(out["kernel"], np.float32)             # (1,1,64,3)
    bf = np.asarray(out["bias"], np.float32)               # (3,)

    # up1: K=(dr,dc,t) 576 -> N=raw 256; PReLU alpha per post-d2s channel t
    W1m = W1.reshape(9 * CIN, 256)
    alpha1 = np.tile(a1, 4)                                # (256,)

    # up2, b-split: per (b, a2): K=(du,dvi,t) 576 -> N=(b2,t2) 128
    W2p = np.zeros((2, 2, 9 * CIN, 128), np.float32)
    for b in range(2):
        for a2i in range(2):
            for b2i in range(2):
                q0 = (a2i * 2 + b2i) * CIN
                for du in range(3):
                    for dvi in range(3):
                        k0 = (du * 3 + dvi) * CIN
                        W2p[b, a2i, k0:k0 + CIN,
                            b2i * CIN:(b2i + 1) * CIN] = \
                            W2[du, dvi, :, q0:q0 + CIN]
    b2n = np.zeros((2, 128), np.float32)
    for a2i in range(2):
        for b2i in range(2):
            q0 = (a2i * 2 + b2i) * CIN
            b2n[a2i, b2i * CIN:(b2i + 1) * CIN] = b2[q0:q0 + CIN]
    alpha2 = np.tile(a2, 2)                                # (128,) per t2

    # final 1x1: K=(eo,fo,t) 1024 -> N=(eo,fo,c) 48, block-diagonal
    W3p = np.zeros((16 * CIN, 48), np.float32)
    for ph in range(16):
        W3p[ph * CIN:(ph + 1) * CIN, ph * 3:(ph + 1) * 3] = Wf[0, 0]

    # u8 epilogue: eo-selection matrices (48 -> 12), exact 0/1; col
    # j = fo*3 + c (c in RGB), bgr swaps only the output column order
    Seo = np.zeros((4, 48, 12), np.float32)
    for eo in range(4):
        for fo in range(4):
            for c in range(3):
                out_c = (2 - c) if bgr else c
                Seo[eo, eo * 12 + fo * 3 + c, fo * 3 + out_c] = 1.0

    return dict(
        W1m=W1m.astype(np.float32),
        b1=b1.reshape(256, 1),
        alpha1=alpha1.reshape(256, 1),
        W2p=W2p,
        b2n=b2n.reshape(2, 128, 1),
        alpha2=alpha2.reshape(128, 1),
        W3p=W3p,
        b3=np.tile(bf, 16).reshape(1, 48),
        Seo=Seo,
    )


def prep_weights_srgan_q8(weights):
    """int8 forms of the up2/final matmuls + per-output-channel scales
    (same scheme as tail.prep_weights_q8; VERDICT r2 #1)."""
    out = dict(weights)
    W2p = weights["W2p"]                                   # (2,2,576,128)
    s2 = np.abs(W2p).max(axis=2, keepdims=True) / 127.0 + 1e-12
    out["W2q"] = np.clip(np.round(W2p / s2), -127, 127).astype(np.int8)
    out["s2n"] = s2.reshape(2, 2, 1, 128).transpose(0, 1, 3, 2)
    W3p = weights["W3p"]                                   # (1024, 48)
    s3 = np.abs(W3p).max(axis=0, keepdims=True) / 127.0 + 1e-12
    out["W3q"] = np.clip(np.round(W3p / s3), -127, 127).astype(np.int8)
    out["s3n"] = s3.reshape(1, 48)
    return out


def prep_weights_srgan_qh8(weights, sH):
    """w8 form of the up1 matmul for the int8-h3 path (same channel-scale
    folding as tail.prep_weights_qh8; VERDICT r3 #4a/#4c)."""
    out = dict(weights)
    W1m = weights["W1m"]                                   # (576, 256)
    W1f = W1m * np.tile(sH, W1m.shape[0] // CIN)[:, None]
    s1 = np.abs(W1f).max(axis=0, keepdims=True) / 127.0 + 1e-12
    out["W1q"] = np.clip(np.round(W1f / s1), -127, 127).astype(np.int8)
    out["s1n"] = s1.reshape(256, 1)
    out["sH"] = np.asarray(sH, np.float32)
    return out


# ---------------------------------------------------------------------------
# kernel

def _dot_kn(w, x):
    return jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tail64_kernel(h3_hbm, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref,
                   w3_ref, b3_ref, seo_ref, *rest,
                   brc: int, core_rows: int, n_tiles: int, u8_out: bool,
                   stage: int = 5, q8: bool = False, qh8: bool = False,
                   inv_su1: float = 0.0, inv_sr: float = 0.0):
    """Grid = (tiles, row bands); same band/DMA structure and lane
    conventions as tail.py's _tail_kernel (h: lane = col + 1; U1: lane =
    col; R/X3: lane = col + 1; output: real cols at lane [3:123)).
    q8: w8a8 up2/final dots, same scheme as tail.py (the final 1x1 pack
    has no lane rolls here, so X3 assembles from pure i8 slices).
    qh8: additionally int8 h3 DMA + w8a8 up1 (VERDICT r3 #4a/#4c)."""
    if qh8:
        w2q_ref, s2_ref, w3q_ref, s3_ref, s1_ref = rest[0:5]
        out_ref = rest[5]
        h3x2, hroll, x1, u1, u1qr, x2q, r_buf, rq, x3q, sems = rest[6:]
        assert q8 and stage >= 5, "qh8 extends the q8 production kernel"
    elif q8:
        w2q_ref, s2_ref, w3q_ref, s3_ref = rest[0:4]
        out_ref = rest[4]
        h3x2, hroll, x1, u1, u1qr, x2q, r_buf, rq, x3q, sems = rest[5:]
        assert stage >= 5, "q8 supports the production stage only"
    else:
        out_ref = rest[0]
        h3x2, hroll, x1, u1, u1r, x2, r_buf, x3, sems = rest[1:]

    def quant(v):
        return jnp.clip(jnp.round(v), -127.0, 127.0).astype(jnp.int8)

    m1 = (brc + 4) * 128
    m2 = (brc + 2) * 128
    m3 = brc * 128
    lh = (core_rows + 4 + 6) * 128

    n = pl.program_id(0)
    b = pl.program_id(1)
    slot = jax.lax.rem(n, 2)

    @pl.when(jnp.logical_and(n == 0, b == 0))
    def _first():
        pltpu.make_async_copy(h3_hbm.at[0], h3x2.at[0], sems.at[0]).start()

    @pl.when(b == 0)
    def _load():
        pltpu.make_async_copy(h3_hbm.at[n], h3x2.at[slot],
                              sems.at[slot]).wait()

        @pl.when(n + 1 < n_tiles)
        def _prefetch():
            pltpu.make_async_copy(h3_hbm.at[n + 1], h3x2.at[1 - slot],
                                  sems.at[1 - slot]).start()

        # qh8: the f32->int8 recast after the 32-bit roll is exact (integer
        # values in [-127, 127])
        rolled = jnp.int8 if qh8 else jnp.bfloat16
        hf = h3x2[slot].astype(jnp.float32)
        hroll[0] = pltpu.roll(hf, lh - 1, 1).astype(rolled)
        hroll[1] = pltpu.roll(hf, lh - 2, 1).astype(rolled)

    h3 = h3x2.at[slot]
    base = b * brc + 2

    def _probe(vv):      # ablation-only output (tools/exp_tail64_ablate)
        out_ref[:, 0] = (vv[0:brc, 0:128].astype(jnp.float32)[:, :, None]
                         + jnp.zeros((brc, 128, 48), jnp.float32)
                         ).astype(jnp.bfloat16)

    if stage >= 1:
        # ---- up1: X1 (576, M1) <- 9 aligned slices of h / rolled h
        for dr in range(3):
            off1 = pl.multiple_of((base + dr) * 128, 128)
            for dc in range(3):
                src = h3 if dc == 0 else hroll.at[dc - 1]
                x1[(dr * 3 + dc) * CIN:(dr * 3 + dc + 1) * CIN, :] = \
                    src[:, pl.ds(off1, m1)]
        if qh8:
            v32 = jax.lax.dot_general(
                w1_ref[:], x1[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)          # (256, M1)
            v = v32.astype(jnp.float32) * s1_ref[:] + b1_ref[:]
        else:
            v = _dot_kn(w1_ref[:], x1[:]) + b1_ref[:]      # (256, M1)
        u1[:] = jnp.where(v >= 0, v, a1_ref[:] * v)        # PReLU, f32
    if stage == 1:
        return _probe(u1[:])

    # up2 column taps: X2[l=j+1] = U1[lane j + cxu] = U1[l + cxu - 1];
    # shifts cxu-1 in {-2,-1,0}: u1r[0]=shift -1, u1r[1]=shift -2
    if q8:
        u1qr[0] = quant(u1[:] * inv_su1)
        u1qr[1] = quant(pltpu.roll(u1[:], 1, 1) * inv_su1)
        u1qr[2] = quant(pltpu.roll(u1[:], 2, 1) * inv_su1)
    else:
        u1r[0] = pltpu.roll(u1[:], 1, 1).astype(jnp.bfloat16)
        u1r[1] = pltpu.roll(u1[:], 2, 1).astype(jnp.bfloat16)
    if stage == 2:
        return _probe(u1r[0].astype(jnp.float32))

    # ---- up2 (b-split): per (a, b) one X2 (576, M2); 2 matmuls (a2)
    for a in range(2):
        for bcol in range(2):
            for du in range(3):
                app = a + du - 1
                a_src, cyu = app & 1, (app - (app & 1)) // 2
                off = (cyu + 1) * 128
                for dvi in range(3):
                    s = bcol + dvi - 1
                    b_src, cxu = s & 1, (s - (s & 1)) // 2
                    blk = (a_src * 2 + b_src) * CIN
                    k0 = (du * 3 + dvi) * CIN
                    if q8:
                        x2q[k0:k0 + CIN, :] = \
                            u1qr[1 - cxu, blk:blk + CIN, off:off + m2]
                    elif cxu == 1:      # shift 0: U1 direct
                        x2[k0:k0 + CIN, :] = \
                            u1[blk:blk + CIN,
                               off:off + m2].astype(jnp.bfloat16)
                    else:               # shift cxu-1 in {-1,-2}
                        x2[k0:k0 + CIN, :] = u1r[-cxu, blk:blk + CIN,
                                                 off:off + m2]
            for a2i in range(2):
                if q8:
                    v32 = jax.lax.dot_general(
                        w2q_ref[bcol, a2i], x2q[:],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    v2 = v32.astype(jnp.float32) * s2_ref[bcol, a2i] \
                        + b2_ref[a2i]
                else:
                    v2 = _dot_kn(w2_ref[bcol, a2i], x2[:]) + b2_ref[a2i]
                vp = jnp.where(v2 >= 0, v2, a2_ref[:] * v2)
                r_buf[2 * a + a2i, bcol] = vp.astype(jnp.bfloat16)
                if q8:
                    rq[2 * a + a2i, bcol] = quant(vp * inv_sr)

    if stage == 3:
        return _probe(r_buf[0, 0].astype(jnp.float32))

    # ---- final 1x1: X3 (1024, M3) = 16 aligned slices of R (no rolls)
    for eo in range(4):
        for fo in range(4):
            bcol, b2i = fo >> 1, fo & 1
            k0 = (eo * 4 + fo) * CIN
            if q8:
                x3q[k0:k0 + CIN, :] = \
                    rq[eo, bcol, b2i * CIN:(b2i + 1) * CIN, 128:128 + m3]
            else:
                x3[k0:k0 + CIN, :] = \
                    r_buf[eo, bcol, b2i * CIN:(b2i + 1) * CIN,
                          128:128 + m3]

    if stage == 4:
        return _probe(x3[:].astype(jnp.float32))

    if q8:
        r32 = jax.lax.dot_general(
            x3q[:], w3q_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (M3, 48)
        res = r32.astype(jnp.float32) * s3_ref[:]
    else:
        res = jax.lax.dot_general(
            x3[:], w3_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (M3, 48)
    res = jnp.tanh(res + b3_ref[:])
    if not u8_out:
        out_ref[:, 0] = res.astype(jnp.bfloat16).reshape(brc, 128, 48)
    else:
        rr = pltpu.roll(res, m3 - 3, 0).astype(jnp.bfloat16)
        for eo in range(4):
            vv = jax.lax.dot_general(
                rr, seo_ref[eo], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (M3, 12)
            u = jnp.clip((vv + 1.0) * 127.5 + 0.5, 0.0, 255.0)
            u8v = u.astype(jnp.int32).astype(jnp.uint8)
            out_ref[:, eo, 0] = u8v.reshape(brc, 128, 12)[:, :CORE, :]


def build_tail64_call(weights: dict[str, np.ndarray], ny: int, nx: int,
                      brc: int = 15, core_rows: int = CORE,
                      u8_out: bool = False, interpret: bool = False,
                      stage: int = 5,
                      q8_scales: tuple[float, float] | None = None,
                      qh8: bool = False):
    """Returns fn(h3 (N, 64, (core_rows+10)*128) bf16 — int8 when qh8) ->
    canvas (ny*core_rows, nx, 128, 48) bf16 or
    (ny*core_rows, 4, nx, 120, 12) u8 (same contracts as tail.py's
    build_tail_call)."""
    assert core_rows % brc == 0
    assert not qh8 or q8_scales is not None, "qh8 extends the q8 kernel"
    n_tiles = ny * nx
    tr = core_rows + 4
    m1, m2, m3 = (brc + 4) * 128, (brc + 2) * 128, brc * 128

    if qh8:
        w1 = jnp.asarray(weights["W1q"], jnp.int8)
    else:
        w1 = jnp.asarray(weights["W1m"], jnp.bfloat16)
    b1 = jnp.asarray(weights["b1"], jnp.float32)
    a1 = jnp.asarray(weights["alpha1"], jnp.float32)
    w2 = jnp.asarray(weights["W2p"], jnp.bfloat16)
    b2 = jnp.asarray(weights["b2n"], jnp.float32)
    a2 = jnp.asarray(weights["alpha2"], jnp.float32)
    w3 = jnp.asarray(weights["W3p"], jnp.bfloat16)
    b3 = jnp.asarray(weights["b3"], jnp.float32)
    seo = jnp.asarray(weights["Seo"], jnp.bfloat16)
    q8 = q8_scales is not None
    q_in = []
    inv_su1 = inv_sr = 0.0
    if q8:
        su1, sr = q8_scales
        inv_su1, inv_sr = 1.0 / su1, 1.0 / sr
        q_in = [jnp.asarray(weights["W2q"], jnp.int8),
                jnp.asarray(weights["s2n"] * su1, jnp.float32),
                jnp.asarray(weights["W3q"], jnp.int8),
                jnp.asarray(weights["s3n"] * sr, jnp.float32)]
        if qh8:
            q_in.append(jnp.asarray(weights["s1n"], jnp.float32))

    kernel = functools.partial(_tail64_kernel, brc=brc, core_rows=core_rows,
                               n_tiles=n_tiles, u8_out=u8_out, stage=stage,
                               q8=q8, qh8=qh8, inv_su1=inv_su1,
                               inv_sr=inv_sr)

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * (9 + len(q_in))
    bands = core_rows // brc
    if u8_out:
        out_spec = pl.BlockSpec(
            (brc, 4, 1, CORE, 12),
            lambda n, b, nx=nx, bands=bands: ((n // nx) * bands + b, 0,
                                              n % nx, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((ny * core_rows, 4, nx, CORE, 12),
                                         jnp.uint8)
    else:
        out_spec = pl.BlockSpec(
            (brc, 1, 128, 48),
            lambda n, b, nx=nx, bands=bands: ((n // nx) * bands + b,
                                              n % nx, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((ny * core_rows, nx, 128, 48),
                                         jnp.bfloat16)

    if q8:
        hdt = jnp.int8 if qh8 else jnp.bfloat16
        scratches = [
            pltpu.VMEM((2, CIN, (tr + 6) * 128), hdt),     # h3 x2
            pltpu.VMEM((2, CIN, (tr + 6) * 128), hdt),     # h rolled
            pltpu.VMEM((9 * CIN, m1), hdt),                # X1
            pltpu.VMEM((256, m1), jnp.float32),            # U1
            pltpu.VMEM((3, 256, m1), jnp.int8),            # U1 quant x3
            pltpu.VMEM((9 * CIN, m2), jnp.int8),           # X2 quant
            pltpu.VMEM((4, 2, 128, m2), jnp.bfloat16),     # R phase bufs
            pltpu.VMEM((4, 2, 128, m2), jnp.int8),         # R quant
            pltpu.VMEM((16 * CIN, m3), jnp.int8),          # X3 quant
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratches = [
            pltpu.VMEM((2, CIN, (tr + 6) * 128), jnp.bfloat16),  # h3 x2
            pltpu.VMEM((2, CIN, (tr + 6) * 128), jnp.bfloat16),  # h rolled
            pltpu.VMEM((9 * CIN, m1), jnp.bfloat16),       # X1
            pltpu.VMEM((256, m1), jnp.float32),            # U1
            pltpu.VMEM((2, 256, m1), jnp.bfloat16),        # U1 rolled
            pltpu.VMEM((9 * CIN, m2), jnp.bfloat16),       # X2
            pltpu.VMEM((4, 2, 128, m2), jnp.bfloat16),     # R phase bufs
            pltpu.VMEM((16 * CIN, m3), jnp.bfloat16),      # X3
            pltpu.SemaphoreType.DMA((2,)),
        ]
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles, bands),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratches,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=max(56, 4 * brc + (8 if q8 else 0))
            * 1024 * 1024),
        interpret=interpret,
    )

    def run(h3):
        return call(h3, w1, b1, a1, w2, b2, a2, w3, b3, seo, *q_in)

    return run


def _q8_setup64(tail_params, weights, q8_calib, qh8: bool = False):
    if q8_calib is None:
        return weights, None, None
    from denoise_gan_tpu.ops.pallas.tail import Q8_MARGIN
    weights = prep_weights_srgan_q8(weights)
    scales = calibrate_tail_scales(tail_params, q8_calib, margin=Q8_MARGIN)
    sH = None
    if qh8:
        sH = calibrate_h_scales(q8_calib, margin=Q8_MARGIN)
        weights = prep_weights_srgan_qh8(weights, sH)
    return weights, scales, sH


def build_fused_tail64(tail_params: Any, ny: int, nx: int, brc: int = 15,
                       core_rows: int = CORE, interpret: bool = False,
                       prep: str = "transpose", q8_calib=None,
                       qh8: bool = False):
    """fn(h_tiles (ny*nx, core_rows+4, T, 64)) ->
    (ny*core_rows, nx*CORE, 48) bf16 phase-canonical crop-stitched canvas."""
    weights = prep_weights_srgan(tail_params)
    weights, q8_scales, sH = _q8_setup64(tail_params, weights, q8_calib, qh8)
    call = build_tail64_call(weights, ny, nx, brc, core_rows,
                             interpret=interpret, q8_scales=q8_scales,
                             qh8=sH is not None)

    def run(h_tiles):
        h3 = (make_h3_q8(h_tiles, sH, prep, cin=CIN) if sH is not None
              else make_h3(h_tiles, prep, cin=CIN))
        canvas = call(h3)
        return canvas[:, :, 3:123, :].reshape(ny * core_rows, nx * CORE, 48)

    return run


def build_fused_tail64_u8(tail_params: Any, ny: int, nx: int, brc: int = 15,
                          core_rows: int = CORE, interpret: bool = False,
                          prep: str = "transpose", flat: bool = False,
                          q8_calib=None, bgr: bool = False,
                          qh8: bool = False):
    """fn(h_tiles (ny*nx, core_rows+4, T, 64)) -> uint8 fine image bytes
    (see tail.py build_fused_tail_u8 for the flat / 5D / bgr contracts)."""
    weights = prep_weights_srgan(tail_params, bgr=bgr)
    weights, q8_scales, sH = _q8_setup64(tail_params, weights, q8_calib, qh8)
    call = build_tail64_call(weights, ny, nx, brc, core_rows, u8_out=True,
                             interpret=interpret, q8_scales=q8_scales,
                             qh8=sH is not None)

    def run(h_tiles):
        h3 = (make_h3_q8(h_tiles, sH, prep, cin=CIN) if sH is not None
              else make_h3(h_tiles, prep, cin=CIN))
        out = call(h3)
        if flat:
            return out.reshape(ny * core_rows * 4, nx * CORE * 12)
        return out

    return run
