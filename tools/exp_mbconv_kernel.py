"""Pallas TPU kernel: fused MobileNetV2 inverted-residual block (inference).

EXPERIMENTAL / documented negative result (PERF.md roadmap item 1): correct
on TPU and in interpret mode, but slower end-to-end than the XLA body (the
Mosaic depthwise is VMEM-port-bound, tools/exp_dw_forms.py), so production
never imports it — it lives in tools/ as the probe backing the body floor
analysis (VERDICT r2 weak #7).  Covered by tests/test_pallas_mbconv.py.

The FSRGAN body is 6 inverted residuals at 32 channels
(/root/reference/fsrgan.py:112-176).  Under XLA each block materializes its
192-channel expanded activations to HBM three times (expand out, depthwise
out, project in) — ~150MB of traffic per block per 8-tile chunk for ~13
GFLOP of work.  This kernel keeps the expanded tensor entirely in VMEM:

    HBM -> VMEM:  (rows+2, W+2, 32) input slab (1-px halo for the depthwise)
    MXU:          expand 1x1 as (rows+2)(W+2) x 32 @ 32 x 192  (+bias, ReLU)
    VPU:          3x3 depthwise as 9 shifted FMAs in f32        (+bias, ReLU)
    MXU:          project 1x1 as rows*W x 192 @ 192 x 32        (+bias)
    VMEM -> HBM:  (rows, W, 32) output (+ residual add)

BatchNorms are pre-folded into the conv weights/biases (inference running
stats are a per-channel affine).  Training uses the plain XLA path; this
kernel has no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mbconv_kernel(xp_hbm, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref,
                   out_ref, xin, sem, *, rb: int, width: int, wpad: int,
                   has_expand: bool, residual: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(xp_hbm.at[b, pl.ds(i * rb, rb + 2)],
                                 xin, sem)
    copy.start()
    copy.wait()

    xv = xin[:]                                    # (rb+2, wpad, C)
    c = xv.shape[-1]
    if has_expand:
        e_dim = we_ref.shape[-1]
        flat = xv.reshape((rb + 2) * wpad, c)
        e = jnp.dot(flat, we_ref[:], preferred_element_type=jnp.float32)
        e = jnp.maximum(e + be_ref[:], 0.0)            # stays f32 for rolls
        e = e.reshape(rb + 2, wpad, e_dim)
    else:
        e = xv.astype(jnp.float32)
        e_dim = c

    # 3x3 depthwise as 9 rolled FMAs: rolls keep every access tile-aligned
    # (misaligned sublane slices scalarize on Mosaic; rotates require 32-bit
    # data, hence f32).  Wrapped-in values land in the zero padding ring,
    # which is exactly the SAME-conv zero neighbor, so the interior rows
    # [1:rb+1] are correct.
    acc = jnp.zeros((rb + 2, wpad, e_dim), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            shifted = pltpu.roll(e, (1 - dr) % (rb + 2), 0)
            shifted = pltpu.roll(shifted, (1 - dc) % wpad, 1)
            acc = acc + shifted * wd_ref[dr, dc, :]
    d = jnp.maximum(acc + bd_ref[:], 0.0).astype(xv.dtype)
    d = d[1:rb + 1]                                # interior rows

    p = jnp.dot(d.reshape(rb * wpad, e_dim), wp_ref[:],
                preferred_element_type=jnp.float32) + bp_ref[:]
    p = p.reshape(rb, wpad, c)
    if residual:
        p = p + xin[1:rb + 1].astype(jnp.float32)
    # align the output slice: roll the image columns to offset 0 first
    p = pltpu.roll(p, wpad - 1, 1)
    out_ref[0] = p[:, :width, :].astype(out_ref.dtype)


def fused_mbconv(x: jax.Array, we, be, wd, bd, wp, bp,
                 rows_per_block: int = 16, has_expand: bool = True,
                 residual: bool = True, interpret: bool = False) -> jax.Array:
    """x (B, H, W, C) -> (B, H, W, C); weights pre-BN-folded:
    we (C, E), be (1, E), wd (3, 3, E), bd (1, E), wp (E, C), bp (1, C).

    C must be lane-aligned (a multiple of 128): Mosaic requires DMA slices
    aligned to the 128-lane tiling.  The builder below zero-pads the 32
    channels (and the corresponding weight rows/cols) to 128 — padded
    channels stay exactly zero through the block."""
    b, h, w, c = x.shape
    assert c % 128 == 0, "pad channels to a multiple of 128"
    rb = rows_per_block
    while h % rb:
        rb //= 2
    # sublane alignment: the DMA'd slab's width must be a multiple of 8
    wpad = (w + 2 + 7) // 8 * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - w - 1), (0, 0)))

    kernel = functools.partial(_mbconv_kernel, rb=rb, width=w, wpad=wpad,
                               has_expand=has_expand, residual=residual)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h // rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded input, manual DMA
            vspec(), vspec(), vspec(), vspec(), vspec(), vspec(),
        ],
        out_specs=pl.BlockSpec((1, rb, w, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb + 2, wpad, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, we, be, wd, bd, wp, bp)


# ---------------------------------------------------------------------------
# BN folding + FSRGAN body assembly


def fold_conv_bn(kernel, bias, bn_params, bn_stats, eps: float = 1e-3):
    """conv -> BatchNorm(running stats) == conv with rescaled weights."""
    kernel = np.asarray(kernel, np.float32)
    bias = np.asarray(bias, np.float32) if bias is not None \
        else np.zeros(kernel.shape[-1], np.float32)
    s = np.asarray(bn_params["scale"]) / np.sqrt(np.asarray(bn_stats["var"]) + eps)
    return kernel * s, (bias - np.asarray(bn_stats["mean"])) * s \
        + np.asarray(bn_params["bias"])


def build_pallas_fsrgan_body(body_params, body_stats, dtype=jnp.bfloat16,
                             n_blocks: int = 6, rows_per_block: int = 16,
                             lane_pad: int = 128):
    """Inference forward of FSRGANBody with all 6 inverted residuals as fused
    Pallas blocks; stem/post convs + PReLU stay in XLA.  Numerically matches
    FSRGANBody.apply(train=False) (BN folded, same math).  The 32-channel
    residual stream runs zero-padded to `lane_pad` channels between blocks."""
    as_dt = lambda a: jnp.asarray(np.asarray(a, np.float32), dtype)

    def pad_rows(m, n):     # (C, E) -> (n, E)
        return np.pad(m, ((0, n - m.shape[0]), (0, 0)))

    def pad_cols(m, n):     # (E, C) -> (E, n)
        return np.pad(m, ((0, 0), (0, n - m.shape[1])))

    stem_k, stem_b = fold_conv_bn(
        body_params["Conv_0"]["kernel"], body_params["Conv_0"]["bias"],
        body_params["BatchNorm_0"], body_stats["BatchNorm_0"])
    stem_alpha = np.asarray(body_params["PReLU_0"]["alpha"])
    post_k, post_b = fold_conv_bn(
        body_params["Conv_1"]["kernel"], body_params["Conv_1"]["bias"],
        body_params["BatchNorm_1"], body_stats["BatchNorm_1"])

    blocks = []
    for idx in range(n_blocks):
        p = body_params[f"InvertedResidual_{idx}"]
        s = body_stats[f"InvertedResidual_{idx}"]
        if idx == 0:
            # no expand: depthwise runs directly on the (padded) stream
            wd, bd = fold_conv_bn(p["depthwise"]["kernel"],
                                  p["depthwise"]["bias"],
                                  p["BatchNorm_0"], s["BatchNorm_0"])
            wp, bp = fold_conv_bn(p["project"]["kernel"],
                                  p["project"]["bias"],
                                  p["BatchNorm_1"], s["BatchNorm_1"])
            wd = np.pad(np.asarray(wd)[:, :, 0, :],
                        ((0, 0), (0, 0), (0, lane_pad - wd.shape[-1])))
            bd = np.pad(bd, (0, lane_pad - bd.shape[0]))
            wp = pad_cols(pad_rows(np.asarray(wp)[0, 0], lane_pad), lane_pad)
            we = np.zeros((lane_pad, lane_pad), np.float32)
            be = np.zeros(lane_pad, np.float32)
            has_expand = False
        else:
            we, be = fold_conv_bn(p["expand"]["kernel"], p["expand"]["bias"],
                                  p["BatchNorm_0"], s["BatchNorm_0"])
            we = pad_rows(we[0, 0], lane_pad)              # (1,1,C,E)->(128,E)
            wd, bd = fold_conv_bn(p["depthwise"]["kernel"],
                                  p["depthwise"]["bias"],
                                  p["BatchNorm_1"], s["BatchNorm_1"])
            wd = np.asarray(wd)[:, :, 0, :]                # (3,3,1,E)->(3,3,E)
            wp, bp = fold_conv_bn(p["project"]["kernel"],
                                  p["project"]["bias"],
                                  p["BatchNorm_2"], s["BatchNorm_2"])
            wp = pad_cols(np.asarray(wp)[0, 0], lane_pad)  # (E, 128)
            has_expand = True
        bp = np.pad(bp, (0, lane_pad - bp.shape[0]))
        blocks.append(dict(
            we=as_dt(we), be=as_dt(be[None]), wd=as_dt(wd), bd=as_dt(bd[None]),
            wp=as_dt(wp), bp=as_dt(bp[None]), has_expand=has_expand))

    c_real = stem_k.shape[-1]
    stem_k = as_dt(stem_k)
    stem_b = as_dt(stem_b)
    # post conv consumes the padded stream directly (zero-padded input rows)
    post_k = as_dt(np.pad(post_k, ((0, 0), (0, 0),
                                   (0, lane_pad - post_k.shape[2]), (0, 0))))
    post_b = as_dt(post_b)
    alpha = as_dt(stem_alpha)

    def body_fwd(x):
        x = x.astype(dtype)
        h = jax.lax.conv_general_dilated(
            x, stem_k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + stem_b
        h = jnp.where(h >= 0, h, alpha * h)
        c1 = h
        r = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, lane_pad - c_real)))
        for blk in blocks:
            r = fused_mbconv(r, blk["we"], blk["be"], blk["wd"], blk["bd"],
                             blk["wp"], blk["bp"],
                             rows_per_block=rows_per_block,
                             has_expand=blk["has_expand"])
        h = jax.lax.conv_general_dilated(
            r, post_k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + post_b
        return h + c1

    return body_fwd
