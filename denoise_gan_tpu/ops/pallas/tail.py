"""Fused Pallas FSRGAN tail: up1 -> up2 -> out_conv -> tanh -> crop-stitch,
one kernel, all intermediates VMEM-resident.

Replaces the XLA coarse tail + crop_stitch (infer/fast.py build_coarse_tail +
infer/engine.py crop_stitch) for fsrgan inference.  Numerically equivalent to
the plain FSRGANTail (models/fsrgan.py, /root/reference/fsrgan.py:178-218)
on every core pixel (the crop-stitch geometry consumes exactly the conv
halos, so no tile-edge SAME-pad case reaches the output — see tests).

Why a kernel: the XLA tail pays (a) 16x structural zeros in the m=4
scattered final conv (PERF.md), (b) an output-lane pad 48->128, and (c) HBM
round trips between stages.  Design notes (all slices tile-aligned):

* Activations live TRANSPOSED: (channels on sublanes, space on lanes), with
  space chunked as row-blocks of 128 lanes (tile width 124, conv halo 2
  -> exactly 128 stored columns per row).  Channel-block selection is then
  a sublane slice (32-mult), row shifts are 128-mult lane slices, and the
  only misaligned ops are +-1 lane shifts done with pltpu.roll on f32.
* Tiles are RECTANGULAR: width fixed at 124 (the lane geometry), height
  `core_rows + 4` free — rows are just the kernel's internal band loop, so
  the tile grid can be shaped to keep the BODY batch <= 128 (XLA conv
  throughput cliffs above 128 tiles, PERF.md r2: 1080p runs 8x16 tiles of
  139x124 instead of 9x16 of 124x124).
* up1 is one K=288 matmul per band from 9 aligned slices of h and two
  in-kernel lane-rolled copies — no in-kernel transposes.
* up2 runs as 4 matmuls (row-phase a x channel-sub-phase a2), each K=384
  (3 row taps x the 4-column union window x 32ch), N=128, producing the
  four fine-row-phase buffers R_e directly (e = 2a + a2).
* the final 3x3 fine-space conv is ONE K=1152 matmul (6 fine rows x 6 fine
  cols x 32ch packed, zero structural waste in K) with N=48 output
  (eo,fo,c), emitted as (M, 48) so the 48 pads harmlessly on lanes.
* h3 tile DMAs are DOUBLE-BUFFERED across grid steps (tile n+1 loads while
  tile n computes).
* two epilogues:
  - 'canvas': bf16 crop-stitched canvas (ny*CR, nx, 128, 48), real columns
    at lane [3:123) of each chunk (the engine slices + converts in XLA);
  - 'u8':    the full affine+round+uint8+flat-layout fused in-kernel: one
    f32 sublane roll drops the 3-column stitch margin, four tiny (48->12)
    selection matmuls split the fine-row phase eo off the lane dim, and the
    output (ny*CR, 4, nx, 120, 12) uint8 reshapes for FREE to the
    (H*4, W*12) flat byte layout (== row-major HWC).  This removes the
    ~13 ms/frame XLA canvas->u8 relayout (PERF.md r2).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 124          # coarse tile width; T + conv halo 4 == 128 lanes exactly
CORE = 120       # output cols per tile (stride; overlap 4, margins 2)
CIN = 32


# ---------------------------------------------------------------------------
# weight preparation (host-side numpy)

def prep_weights(tail_params: Any, bgr: bool = False) -> dict[str, np.ndarray]:
    """Pack the plain FSRGANTail params (models/fsrgan.py FSRGANTail) into
    the kernel's matmul forms.

    bgr=True permutes the u8 epilogue's eo-selection columns so the kernel
    emits BGR byte order directly (what cv2's mp4 writer consumes) — a free
    column permutation on device that saves a 95 MB/frame strided host copy
    in the video CLI."""
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

    # u8 epilogue: eo-selection matrices (48 -> 12), exact 0/1 in bf16.
    # Source col j = fo*3 + c with c in RGB; bgr swaps the c order of the
    # OUTPUT column only (b3/tanh act on the pre-selection RGB columns).
    Seo = np.zeros((4, 48, 12), np.float32)
    for eo in range(4):
        for fo in range(4):
            for c in range(3):
                out_c = (2 - c) if bgr else c
                Seo[eo, eo * 12 + fo * 3 + c, fo * 3 + out_c] = 1.0

    return dict(
        W1m=W1m.astype(np.float32),
        b1=b1.reshape(128, 1),
        alpha1=alpha1.reshape(128, 1),
        W2p=W2p,
        b2n=b2n.reshape(2, 128, 1),
        alpha2=alpha2.reshape(128, 1),
        W3p=W3p,
        b3=np.tile(bf, 16).reshape(1, 48),   # per (eo,fo,c) col: bf[c]
        Seo=Seo,
    )


def prep_weights_q8(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Extend prep_weights() output with w8 forms of the up2/final matmuls
    (VERDICT r2 #1): symmetric per-output-channel int8 weights + f32 scales.
    up1 stays bf16 (its operand feeds f32 lane rolls; quantizing it buys
    ~1 ms at best and complicates the h3 DMA contract)."""
    out = dict(weights)
    W2p = weights["W2p"]                                   # (2,2,384,128)
    s2 = np.abs(W2p).max(axis=2, keepdims=True) / 127.0 + 1e-12
    out["W2q"] = np.clip(np.round(W2p / s2), -127, 127).astype(np.int8)
    out["s2n"] = s2.reshape(2, 2, 1, 128).transpose(0, 1, 3, 2)  # (2,2,128,1)
    W3p = weights["W3p"]                                   # (1152, 48)
    s3 = np.abs(W3p).max(axis=0, keepdims=True) / 127.0 + 1e-12
    out["W3q"] = np.clip(np.round(W3p / s3), -127, 127).astype(np.int8)
    out["s3n"] = s3.reshape(1, 48)
    return out


def calibrate_h_scales(h_sample: jax.Array,
                       margin: float = 1.0) -> np.ndarray:
    """Per-channel int8 step sizes for the BODY OUTPUT h (the qh8 tail input,
    VERDICT r3 #4a): sH[c] = max|h[..., c]| * margin / 127 over the sample
    tiles.  Per-channel (not per-tensor) because the 32 body channels span
    very different ranges post-BN; the channel scale folds into W1's K rows
    before W1's own per-column quantization."""
    m = np.asarray(jnp.max(jnp.abs(h_sample.astype(jnp.float32)),
                           axis=tuple(range(h_sample.ndim - 1))))
    return np.maximum(m * margin / 127.0, 1e-9).astype(np.float32)


def prep_weights_qh8(weights: dict[str, np.ndarray],
                     sH: np.ndarray) -> dict[str, np.ndarray]:
    """Extend prep_weights_q8() output with the w8 form of the up1 matmul for
    the int8-h3 path: fold the per-channel h scales into W1m's K rows
    (sum_k W1[k,n] x[k] == sum_k (W1[k,n]*sH[k]) (x[k]/sH[k])), then
    symmetric per-output-channel int8."""
    out = dict(weights)
    W1m = weights["W1m"]                                   # (288, 128)
    cin = sH.shape[0]
    W1f = W1m * np.tile(sH, W1m.shape[0] // cin)[:, None]
    s1 = np.abs(W1f).max(axis=0, keepdims=True) / 127.0 + 1e-12
    out["W1q"] = np.clip(np.round(W1f / s1), -127, 127).astype(np.int8)
    out["s1n"] = s1.reshape(128, 1)
    out["sH"] = np.asarray(sH, np.float32)
    return out


def make_h3_q8(h_tiles: jax.Array, sH, prep: str = "transpose",
               cin: int = CIN) -> jax.Array:
    """make_h3 with a fused per-channel int8 quantization epilogue: the
    kernel's h3 DMA (the largest tail input) moves HALF the bytes of bf16.
    Rounding runs in f32 so the int grid is exact."""
    n, tr = h_tiles.shape[0], h_tiles.shape[1]
    hb = h_tiles.astype(jnp.bfloat16)
    hp = jnp.pad(hb, ((0, 0), (3, 3), (1, 3), (0, 0)))     # (N,TR+6,128,cin)
    if prep == "conv":
        eye = jnp.eye(cin, dtype=jnp.bfloat16).reshape(1, 1, cin, cin)
        ht = jax.lax.conv_general_dilated(
            hp, eye, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))    # (N,cin,TR+6,128)
    else:
        ht = hp.transpose(0, 3, 1, 2)
    inv = jnp.asarray(1.0 / np.asarray(sH), jnp.float32).reshape(1, cin, 1, 1)
    q = jnp.clip(jnp.round(ht.astype(jnp.float32) * inv), -127.0, 127.0)
    return q.astype(jnp.int8).reshape(n, cin, (tr + 6) * 128)


def calibrate_tail_scales(tail_params: Any, h_sample: jax.Array,
                          margin: float = 1.0) -> tuple[float, float]:
    """Static activation scales for the w8a8 tail: run the plain tail math
    (pre-depth_to_space channel layout — elementwise-equivalent to the
    kernel's phase buffers) on a sample of body-output tiles and take
    max|up1_prelu| and max|up2_prelu|.  Returns (su1, sr) — the int8 step
    sizes.  Saturating clip in the kernel covers anything beyond the
    calibration max."""
    up1 = tail_params["up1"]
    up2 = tail_params["up2"]
    W1 = jnp.asarray(up1["Conv_0"]["kernel"], jnp.float32)
    b1 = jnp.asarray(up1["Conv_0"]["bias"], jnp.float32)
    a1 = jnp.tile(jnp.asarray(up1["PReLU_0"]["alpha"], jnp.float32), 4)
    W2 = jnp.asarray(up2["Conv_0"]["kernel"], jnp.float32)
    b2 = jnp.asarray(up2["Conv_0"]["bias"], jnp.float32)
    a2 = jnp.tile(jnp.asarray(up2["PReLU_0"]["alpha"], jnp.float32), 4)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.asarray(h_sample, jnp.float32)
    c1 = conv(x, W1) + b1
    u1 = jnp.where(c1 >= 0, c1, a1 * c1)
    from denoise_gan_tpu.ops.image import depth_to_space
    d1 = depth_to_space(u1, 2)
    c2 = conv(d1, W2) + b2
    r = jnp.where(c2 >= 0, c2, a2 * c2)
    su1 = float(jnp.max(jnp.abs(u1))) * margin / 127.0
    sr = float(jnp.max(jnp.abs(r))) * margin / 127.0
    return max(su1, 1e-9), max(sr, 1e-9)


# ---------------------------------------------------------------------------
# XLA-side input prep

def make_h3(h_tiles: jax.Array, prep: str = "transpose",
            cin: int = CIN) -> jax.Array:
    """(N, TR, 124, cin) body output -> (N, cin, (TR+6)*128) bf16 chunk-flat,
    ONE copy: channel-major, rows as 128-lane chunks holding cols [-1, 127)
    (124 output cols only ever read cols [-1,126), so one 128-chunk covers
    every tap; the dc-shifts become two in-kernel lane rolls).

    The (px, ch) -> (ch, px) relayout is the expensive part on TPU; two
    producers are available:
    * 'transpose' — jnp.transpose (XLA relayout)
    * 'conv'      — 1x1 identity conv with NCHW output layout (the conv
      emitter performs the relayout; measured faster, PERF.md r2)
    The final (TR+6,128)->flat flatten is layout-free because the minor
    dim is exactly one lane-tile wide."""
    n, tr = h_tiles.shape[0], h_tiles.shape[1]
    hb = h_tiles.astype(jnp.bfloat16)
    hp = jnp.pad(hb, ((0, 0), (3, 3), (1, 3), (0, 0)))     # (N,TR+6,128,32)
    if prep == "conv":
        eye = jnp.eye(cin, dtype=jnp.bfloat16).reshape(1, 1, cin, cin)
        ht = jax.lax.conv_general_dilated(
            hp, eye, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))    # (N,cin,TR+6,128)
    else:
        ht = hp.transpose(0, 3, 1, 2)                      # (N,cin,TR+6,128)
    return ht.reshape(n, cin, (tr + 6) * 128)


# ---------------------------------------------------------------------------
# kernel

def _dot_kn(w, x):
    """(K, N) x (K, M) -> (N, M), f32 accumulate."""
    return jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tail_kernel(h3_hbm, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref,
                 w3_ref, b3_ref, seo_ref, *rest,
                 brc: int, core_rows: int, n_tiles: int, u8_out: bool,
                 stage: int = 5, q8: bool = False, qh8: bool = False,
                 inv_su1: float = 0.0, inv_sr: float = 0.0):
    """Grid = (tiles, row bands); the out block is per BAND (a whole-tile u8
    block would pay the 12->128 lane pad x2 in VMEM: 16.6MB at 1080p).  The
    h3 tile DMA runs at band 0 and is double-buffered across tiles.

    Lane conventions (within each 128-lane row chunk):
      h: lane = col + 1 (cols [-1, 127));  U1: lane = col (cols [0, 124));
      U2/R_e/X3: lane = col + 1;  output: lane = col + 1 -> real [3:123).

    q8=True (VERDICT r2 #1): the up2 and final dots run w8a8 on the int8
    MXU — U1/R activations are quantized with static calibrated scales
    (calibrate_tail_scales), weights per-output-channel (prep_weights_q8);
    dequant scale products are folded into the existing bias/PReLU
    epilogues.  up1 and the u8 epilogue stay bf16/f32.  pltpu.roll needs
    32-bit data, so rolled operands are rolled in f32 then quantized."""
    if qh8:
        # q8 + int8 h3 DMA + w8a8 up1 (VERDICT r3 #4a/#4c): the h3 tile DMA
        # (the largest tail input) moves half the bytes; up1 runs on the
        # int8 MXU with the per-channel h scales pre-folded into W1q.
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

        h3v = h3x2.at[slot]
        # dc column taps as whole-tile lane shifts: X1[l=col] = h[col+dc-1]
        # = h_lane(l + dc); roll(x, L-s): out[l] = in[l+s].  pltpu.roll
        # needs 32-bit data; for qh8 the f32->int8 recast is exact (the
        # values are integers in [-127, 127]).
        rolled = jnp.int8 if qh8 else jnp.bfloat16
        hf = h3v[:].astype(jnp.float32)
        hroll[0] = pltpu.roll(hf, lh - 1, 1).astype(rolled)
        hroll[1] = pltpu.roll(hf, lh - 2, 1).astype(rolled)

    h3 = h3x2.at[slot]
    if stage >= 1:
        base = b * brc + 2     # h_pad row chunk of U1 row 0 (dr=0)

        # ---- up1: X1 (288, M1) <- 9 aligned slices of h / rolled h
        for dr in range(3):
            off1 = pl.multiple_of((base + dr) * 128, 128)
            for dc in range(3):
                src = h3 if dc == 0 else hroll.at[dc - 1]
                x1[(dr * 3 + dc) * CIN:(dr * 3 + dc + 1) * CIN, :] = \
                    src[:, pl.ds(off1, m1)]
        if qh8:
            v32 = jax.lax.dot_general(
                w1_ref[:], x1[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)          # (128, M1)
            v = v32.astype(jnp.float32) * s1_ref[:] + b1_ref[:]
        else:
            v = _dot_kn(w1_ref[:], x1[:]) + b1_ref[:]      # (128, M1)
        u1[:] = jnp.where(v >= 0, v, a1_ref[:] * v)        # PReLU, f32
    if stage == 1:      # ablation: keep up1 alive (tools/exp_tail_ablate)
        out_ref[:, 0] = (u1[0:brc, 0:128][:, :, None]
                         + jnp.zeros((brc, 128, 48), jnp.float32)
                         ).astype(jnp.bfloat16)
    if stage >= 2 and q8:
        u1qr[0] = quant(u1[:] * inv_su1)
        u1qr[1] = quant(pltpu.roll(u1[:], 1, 1) * inv_su1)
        u1qr[2] = quant(pltpu.roll(u1[:], 2, 1) * inv_su1)
    elif stage >= 2:
        # up2 column taps: X2[l=j+1] = U1[lane j+cx] = U1[l + cx - 1];
        # shifts cx-1 in {-2,-1,0}: roll(x, k): out[l] = in[l-k]
        u1r[0] = pltpu.roll(u1[:], 1, 1).astype(jnp.bfloat16)
        u1r[1] = pltpu.roll(u1[:], 2, 1).astype(jnp.bfloat16)
    if stage == 2:
        out_ref[:, 0] = (u1r[0, 0:brc, 0:128].astype(jnp.float32)[:, :, None]
                         + jnp.zeros((brc, 128, 48), jnp.float32)
                         ).astype(jnp.bfloat16)
    if stage >= 3:
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
                        w2q_ref[a, a2i], x2q[:], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    v2 = v32.astype(jnp.float32) * s2_ref[a, a2i] \
                        + b2_ref[a2i]
                else:
                    v2 = _dot_kn(w2_ref[a, a2i], x2[:]) + b2_ref[a2i]
                vp = jnp.where(v2 >= 0, v2, a2_ref[:] * v2)
                r_buf[2 * a + a2i] = vp.astype(jnp.bfloat16)
                if q8:
                    rq[2 * a + a2i] = quant(vp * inv_sr)
    if stage == 3:
        out_ref[:, 0] = (r_buf[0, 0:brc, 0:128].astype(jnp.float32)[:, :, None]
                         + jnp.zeros((brc, 128, 48), jnp.float32)
                         ).astype(jnp.bfloat16)
    if stage >= 4:
        # ---- final: X3 (1152, M3) packed from the R_e buffers
        for rho in range(-1, 5):
            e, cy = rho & 3, (rho - (rho & 3)) // 4
            off = (cy + 1) * 128
            for kap in range(-1, 5):
                f, cxf = kap & 3, (kap - (kap & 3)) // 4
                k0 = ((rho + 1) * 6 + (kap + 1)) * CIN
                if q8:
                    if cxf:
                        src = pltpu.roll(
                            r_buf[e, f * CIN:(f + 1) * CIN, off:off + m3]
                            .astype(jnp.float32), (-cxf) % m3, 1)
                        x3q[k0:k0 + CIN, :] = quant(src * inv_sr)
                    else:
                        x3q[k0:k0 + CIN, :] = \
                            rq[e, f * CIN:(f + 1) * CIN, off:off + m3]
                    continue
                src = r_buf[e, f * CIN:(f + 1) * CIN, off:off + m3]
                if cxf:
                    # bf16 rotates are rejected; roll in f32
                    src = pltpu.roll(src.astype(jnp.float32),
                                     (-cxf) % m3, 1)
                x3[k0:k0 + CIN, :] = src.astype(jnp.bfloat16)
    if stage == 4:
        out_ref[:, 0] = (x3[0:brc, 0:128].astype(jnp.float32)[:, :, None]
                         + jnp.zeros((brc, 128, 48), jnp.float32)
                         ).astype(jnp.bfloat16)
    if stage >= 5:
        if q8:
            r32 = jax.lax.dot_general(
                x3q[:], w3q_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)          # (M3, 48)
            res = r32.astype(jnp.float32) * s3_ref[:]
        else:
            res = jax.lax.dot_general(
                x3[:], w3_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (M3, 48)
        res = jnp.tanh(res + b3_ref[:])
        if not u8_out:
            out_ref[:, 0] = res.astype(jnp.bfloat16).reshape(brc, 128, 48)
        else:
            # fused u8/flat epilogue: sublane roll drops the 3-col margin
            # (row k <- k+3, i.e. kept lane j maps to col j+3-1 = j+2 = the
            # crop-stitch core), then 4 selection matmuls split eo off the
            # lane dim; affine+trunc matches the XLA (x*255+0.5).astype(u8)
            rr = pltpu.roll(res, m3 - 3, 0).astype(jnp.bfloat16)
            for eo in range(4):
                vv = jax.lax.dot_general(
                    rr, seo_ref[eo], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (M3, 12)
                u = jnp.clip((vv + 1.0) * 127.5 + 0.5, 0.0, 255.0)
                u8v = u.astype(jnp.int32).astype(jnp.uint8)
                out_ref[:, eo, 0] = u8v.reshape(brc, 128, 12)[:, :CORE, :]


def build_tail_call(weights: dict[str, np.ndarray], ny: int, nx: int,
                    brc: int = 8, core_rows: int = CORE,
                    u8_out: bool = False, interpret: bool = False,
                    stage: int = 5,
                    q8_scales: tuple[float, float] | None = None,
                    qh8: bool = False):
    """Returns fn(h3 (N, 32, (core_rows+10)*128) bf16 — int8 when qh8) ->
    * u8_out=False: canvas (ny*core_rows, nx, 128, 48) bf16 (real cols at
      lane [3:123) of each chunk)
    * u8_out=True:  (ny*core_rows, 4, nx, 120, 12) uint8 — reshapes for free
      to the flat (ny*core_rows*4, nx*120*12) byte layout.
    q8_scales=(su1, sr) (calibrate_tail_scales) switches the up2/final dots
    to w8a8 int8 (weights from prep_weights_q8); qh8=True additionally takes
    int8 h3 (make_h3_q8 + prep_weights_qh8) and runs up1 w8a8."""
    assert core_rows % brc == 0
    q8 = q8_scales is not None
    assert not qh8 or q8, "qh8 extends the q8 kernel"
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

    kernel = functools.partial(_tail_kernel, brc=brc, core_rows=core_rows,
                               n_tiles=n_tiles, u8_out=u8_out, stage=stage,
                               q8=q8, qh8=qh8, inv_su1=inv_su1,
                               inv_sr=inv_sr)

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
        pl.BlockSpec(memory_space=pltpu.VMEM),   # Seo
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(q_in)
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
            pltpu.VMEM((128, m1), jnp.float32),            # U1
            pltpu.VMEM((3, 128, m1), jnp.int8),            # U1 quant x3
            pltpu.VMEM((12 * CIN, m2), jnp.int8),          # X2 quant
            pltpu.VMEM((4, 128, m2), jnp.bfloat16),        # R_e
            pltpu.VMEM((4, 128, m2), jnp.int8),            # R_e quant
            pltpu.VMEM((36 * CIN, m3), jnp.int8),          # X3 quant
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratches = [
            pltpu.VMEM((2, CIN, (tr + 6) * 128), jnp.bfloat16),  # h3 x2
            pltpu.VMEM((2, CIN, (tr + 6) * 128), jnp.bfloat16),  # h rolled
            pltpu.VMEM((9 * CIN, m1), jnp.bfloat16),       # X1
            pltpu.VMEM((128, m1), jnp.float32),            # U1
            pltpu.VMEM((2, 128, m1), jnp.bfloat16),        # U1 rolled
            pltpu.VMEM((12 * CIN, m2), jnp.bfloat16),      # X2
            pltpu.VMEM((4, 128, m2), jnp.bfloat16),        # R_e
            pltpu.VMEM((36 * CIN, m3), jnp.bfloat16),      # X3
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
            # 24MB fits brc<=15 at the production geometry; larger bands
            # need more scoped VMEM (v5e has 128MB physical)
            vmem_limit_bytes=max(24, 2 * brc + (8 if q8 else 0))
            * 1024 * 1024),
        interpret=interpret,
    )

    def run(h3):
        return call(h3, w1, b1, a1, w2, b2, a2, w3, b3, seo, *q_in)

    return run


# Headroom over the calibration max: activations in later scenes can exceed
# the sampled frames' range, and the kernel's saturating int8 clip would
# silently flatten them (ADVICE r3).  1.25x costs ~0.3 u8 level of extra
# quantization step (well inside the measured <=1-level envelope,
# tools/exp_q8_exact.py) and absorbs 25% activation growth.
Q8_MARGIN = 1.25


def _q8_setup(tail_params, weights, q8_calib, qh8: bool = False):
    """Returns (weights, q8_scales, sH): sH is the per-channel h3 int8 step
    vector when qh8, else None."""
    if q8_calib is None:
        return weights, None, None
    weights = prep_weights_q8(weights)
    scales = calibrate_tail_scales(tail_params, q8_calib, margin=Q8_MARGIN)
    sH = None
    if qh8:
        sH = calibrate_h_scales(q8_calib, margin=Q8_MARGIN)
        weights = prep_weights_qh8(weights, sH)
    return weights, scales, sH


def build_fused_tail(tail_params: Any, ny: int, nx: int, brc: int = 8,
                     core_rows: int = CORE, interpret: bool = False,
                     prep: str = "transpose", q8_calib=None,
                     qh8: bool = False):
    """fn(h_tiles (ny*nx, core_rows+4, T, 32)) ->
    (ny*core_rows, nx*CORE, 48) bf16 [-1,1] phase-canonical crop-stitched
    canvas.  q8_calib: sample body-output tiles -> w8a8 up2/final dots;
    qh8 additionally int8-quantizes the h3 DMA + runs up1 w8a8."""
    weights = prep_weights(tail_params)
    weights, q8_scales, sH = _q8_setup(tail_params, weights, q8_calib, qh8)
    call = build_tail_call(weights, ny, nx, brc, core_rows,
                           interpret=interpret, q8_scales=q8_scales,
                           qh8=sH is not None)

    def run(h_tiles):
        h3 = (make_h3_q8(h_tiles, sH, prep) if sH is not None
              else make_h3(h_tiles, prep))
        canvas = call(h3)
        return canvas[:, :, 3:123, :].reshape(ny * core_rows, nx * CORE, 48)

    return run


def build_fused_tail_u8(tail_params: Any, ny: int, nx: int, brc: int = 8,
                        core_rows: int = CORE, interpret: bool = False,
                        prep: str = "transpose", flat: bool = True,
                        q8_calib=None, bgr: bool = False,
                        qh8: bool = False):
    """fn(h_tiles (ny*nx, core_rows+4, T, 32)) -> uint8 fine image bytes.

    flat=True: (ny*core_rows*4, nx*CORE*12) — the flat byte layout of the
    HWC fine image.  This DEVICE-side reshape is NOT free: the 5D kernel
    output's (120, 12) minor dims are physically (8,128)-tiled (~10.7x lane
    padding), so XLA relayouts ~1 GB — measured 8.3 ms/frame at 1080p
    (PERF.md r2 profile, reshape.21).

    flat=False: the raw (ny*core_rows, 4, nx, CORE, 12) kernel output.  Its
    C-order element sequence is ALREADY the flat HWC byte stream (row
    (r,eo) major, then (x, col, fo, c)), so
    ``np.asarray(out).reshape(ny*core_rows*4, nx*CORE*12)`` on the host is
    a zero-copy view — the device->host transfer de-tiles either way.
    Prefer this for throughput paths (infer/kernel_engine.py).

    bgr=True: bytes come out BGR-ordered (see prep_weights)."""
    weights = prep_weights(tail_params, bgr=bgr)
    weights, q8_scales, sH = _q8_setup(tail_params, weights, q8_calib, qh8)
    call = build_tail_call(weights, ny, nx, brc, core_rows, u8_out=True,
                           interpret=interpret, q8_scales=q8_scales,
                           qh8=sH is not None)

    def run(h_tiles):
        h3 = (make_h3_q8(h_tiles, sH, prep) if sH is not None
              else make_h3(h_tiles, prep))
        out = call(h3)
        if flat:
            return out.reshape(ny * core_rows * 4, nx * CORE * 12)
        return out

    return run
