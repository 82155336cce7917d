"""Coarse-space inference rewrite of the pixel-shuffle generator tails.

Why: on TPU, the upsample tails of SRGAN/FSRGAN run convolutions at 2x and 4x
spatial resolution with only 3..32 channels (/root/reference/fsrgan.py:213-218)
— tiny channel counts at huge spatial sizes, the worst possible layout for the
MXU's 128-lane registers (measured: the final 1024^2 convs dominate the whole
generator).  But `depth_to_space` is a pure *rearrangement*: any conv applied
after it can be algebraically rewritten as a conv applied *before* it with a
phase-scattered kernel.  Pushing every tail conv down to the coarse 256^2 grid
multiplies the channel dims by 4/16 (128..512 channels — full MXU lanes) and
eliminates all high-resolution intermediates.  The rewrite is exact (same
weights, reindexed; structural zeros in the scattered kernels), so training
uses the plain modules and inference uses this path with identical outputs.

Derivation: represent a fine tensor T at scale m by its coarse form
R[i, j, (e*m+f)*C + c] = T[m*i+e, m*j+f, c] ("canonical layout").  A fine
kxk conv becomes a coarse 3x3 (or 1x1) conv with kernel
K[r, s, idx(e',f',c), idx(e,f,o)] = W[u, v, c, o] where u = m*r + e' - e
(valid iff |u| <= k//2), and TF's depth_to_space ordering
(channel = (dy*block + dx)*C + c) becomes a fixed channel permutation.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.ops.image import depth_to_space


def scatter_conv_kernel(W: np.ndarray, m: int) -> np.ndarray:
    """Fine (kh,kw,cin,cout) conv kernel at phase factor m -> coarse kernel
    over canonical-layout channels (m^2*cin, m^2*cout)."""
    kh, kw, cin, cout = W.shape
    kh2, kw2 = kh // 2, kw // 2
    # Coarse radius: u = m*r + e' - e must reach |u| <= k//2 for all phase
    # offsets e, e' in [0, m), so |r| <= (k//2 + m - 1) // m.  (A hardcoded
    # radius of 1 silently drops taps for k >= 2m+2, ADVICE.md r1.)
    hr = (kh2 + m - 1) // m if kh > 1 else 0
    hs = (kw2 + m - 1) // m if kw > 1 else 0
    K = np.zeros((2 * hr + 1, 2 * hs + 1, m * m * cin, m * m * cout),
                 np.asarray(W).dtype)
    W = np.asarray(W)
    for e in range(m):
        for ep in range(m):
            for r in range(-hr, hr + 1):
                u = m * r + ep - e
                if abs(u) > kh2:
                    continue
                for f in range(m):
                    for fp in range(m):
                        for s in range(-hs, hs + 1):
                            v = m * s + fp - f
                            if abs(v) > kw2:
                                continue
                            K[r + hr, s + hs,
                              (ep * m + fp) * cin:(ep * m + fp + 1) * cin,
                              (e * m + f) * cout:(e * m + f + 1) * cout] \
                                = W[u + kh2, v + kw2]
    return K


def d2s_perm(m: int, c_next: int) -> np.ndarray:
    """Channel permutation converting 'canonical scale-m with 4*c_next fine
    channels' into 'canonical scale-2m with c_next channels' after a
    depth_to_space(2) in fine space (TF channel order (2a+b)*C + c)."""
    P = np.zeros((2 * m) * (2 * m) * c_next, np.int64)
    for e in range(m):
        for f in range(m):
            for a in range(2):
                for b in range(2):
                    base_new = ((2 * e + a) * (2 * m) + (2 * f + b)) * c_next
                    base_old = (e * m + f) * (4 * c_next) + (2 * a + b) * c_next
                    for cc in range(c_next):
                        P[base_new + cc] = base_old + cc
    return P


def _conv(x, K, b, dtype):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(K, dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + jnp.asarray(b, dtype)


def build_coarse_tail(tail_params: Any, stage_names: list[str],
                      final_kernel_fine: np.ndarray, final_bias: np.ndarray,
                      dtype=jnp.bfloat16, final_d2s: bool = True,
                      out_dtype=jnp.float32):
    """Precompute scattered kernels for a tail of 2x pixel-shuffle stages +
    final conv; returns fn(h) -> [-1,1] f32 image at scale 2^len(stages)."""
    # All channel permutations (TF depth_to_space reordering between stages)
    # are folded into the next conv's kernel at build time: each stage's
    # output stays in its "raw" (pre-permutation) layout, the following
    # kernel's input axis is inverse-permuted, and PReLU alphas are permuted
    # vectors.  Zero runtime gathers.
    stages = []
    pend = None  # canonical = raw[pend] for the current tensor
    m = 1
    for name in stage_names:
        p = tail_params[name]
        W = np.asarray(p["Conv_0"]["kernel"])
        b = np.asarray(p["Conv_0"]["bias"])
        alpha = np.asarray(p["PReLU_0"]["alpha"])
        c_next = W.shape[-1] // 4
        K = scatter_conv_kernel(W, m) if m > 1 else W
        if pend is not None:
            K = np.take(K, np.argsort(pend), axis=2)
        bias = np.tile(b, m * m)
        Q = d2s_perm(m, c_next)
        alpha_t = np.tile(alpha, (2 * m) * (2 * m))[np.argsort(Q)]
        # For m>1, the dense scattered 3x3 kernel is (1 - 1/m^2-ish)
        # structural zeros.  Split it into m^2 exact per-output-phase 2x2
        # convs (each phase's taps span only 2 coarse rows/cols): same math,
        # 2.25x fewer FLOPs at m=2 (profiled: the dense conv was the single
        # hottest op in the frame).
        # (guard on the coarse kernel actually being 3x3: a fine kernel
        #  wider than 3 at m=2 has coarse radius 2 and can't phase-split)
        if m == 2 and K.shape[0] == 3 and K.shape[1] == 3:
            # phase a's taps live in rows [a, a+2) of the 3x3
            cout_blk = K.shape[-1] // (m * m)
            phase_ks = []
            for a in range(m):
                for bb in range(m):
                    ph = (m * a + bb) * cout_blk
                    phase_ks.append((
                        K[a:a + 2, bb:bb + 2, :, ph:ph + cout_blk],
                        (1 - a, a), (1 - bb, bb)))
            stages.append(("phased", phase_ks, bias, alpha_t))
        else:
            stages.append(("dense", K, bias, alpha_t))
        pend = Q
        m *= 2

    K_f = scatter_conv_kernel(np.asarray(final_kernel_fine), m)
    if pend is not None:
        K_f = np.take(K_f, np.argsort(pend), axis=2)
    b_f = np.tile(np.asarray(final_bias), m * m)
    scale = m

    def tail(h):
        x = h
        for kind, K, b, alpha in stages:
            if kind == "phased":
                parts = []
                for Kp, pad_r, pad_c in K:
                    xp = jnp.pad(x.astype(dtype),
                                 ((0, 0), pad_r, pad_c, (0, 0)))
                    parts.append(jax.lax.conv_general_dilated(
                        xp, jnp.asarray(Kp, dtype), (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")))
                x = jnp.concatenate(parts, axis=-1) + jnp.asarray(b, dtype)
            else:
                x = _conv(x, K, b, dtype)
            a = jnp.asarray(alpha, dtype)
            x = jnp.where(x >= 0, x, a * x)
        y = _conv(x, K_f, b_f, dtype)
        # out_dtype=bf16 halves the tail-output/stitch traffic; with uint8
        # final output the bf16 eps (~1/2 of a u8 step at 1.0) is harmless
        y = jnp.tanh(y.astype(jnp.float32)).astype(out_dtype)
        # final_d2s=False keeps the phase-channel layout for the frame
        # engine's phase-space stitching (infer/engine.py)
        return depth_to_space(y, scale) if final_d2s else y

    return tail


def build_fast_coarse(config: dict, params: Any, batch_stats: Any,
                      dtype=jnp.bfloat16, out_dtype=jnp.float32):
    """(forward_coarse, scale): body + coarse tail WITHOUT the final
    depth_to_space — (N, T, T, 3) [-1,1] -> (N, T, T, 3*scale^2) phase-channel
    output for the frame engine.  Only for srgan/fsrgan (scale >= 2)."""
    from denoise_gan_tpu.models.fsrgan import FSRGANBody
    from denoise_gan_tpu.models.srgan import SRGANBody

    family = config["family"]
    scale = config["scale"]
    tail_p = params["tail"]
    if family == "fsrgan":
        body = FSRGANBody(dtype=dtype)
        names = ["up1", "up2"]
        scale = 4  # fsrgan always upsamples 4x (/root/reference/fsrgan.py:213-214)
    elif family == "srgan" and scale >= 2:
        body = SRGANBody(dtype=dtype)
        names = [f"up{i + 1}" for i in range(scale // 2)]
    else:
        raise ValueError(f"no coarse path for {family} scale={scale}")

    tail = build_coarse_tail(tail_p, names, tail_p["out_conv"]["kernel"],
                             tail_p["out_conv"]["bias"], dtype,
                             final_d2s=False, out_dtype=out_dtype)
    body_params = params["body"]
    body_stats = batch_stats.get("body", {}) if batch_stats else {}

    def forward_coarse(x):
        h = body.apply({"params": body_params, "batch_stats": body_stats},
                       x, train=False)
        return tail(h)

    return forward_coarse, scale


def build_fast_forward(config: dict, params: Any, batch_stats: Any,
                       dtype=jnp.bfloat16):
    """Jitted NHWC->NHWC generator forward using the coarse-tail rewrite for
    srgan/fsrgan; other families fall back to the plain module."""
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.fsrgan import FSRGANBody
    from denoise_gan_tpu.models.srgan import SRGANBody

    family = config["family"]
    scale = config["scale"]

    if family == "fsrgan":
        body = FSRGANBody(dtype=dtype)
        tail_p = params["tail"]
        tail = build_coarse_tail(
            tail_p, ["up1", "up2"],
            tail_p["out_conv"]["kernel"], tail_p["out_conv"]["bias"], dtype)
    elif family == "srgan" and scale >= 2:
        body = SRGANBody(dtype=dtype)
        tail_p = params["tail"]
        names = [f"up{i + 1}" for i in range(scale // 2)]
        tail = build_coarse_tail(
            tail_p, names,
            tail_p["out_conv"]["kernel"], tail_p["out_conv"]["bias"], dtype)
    else:
        bundle = build_models(family, scale=scale, fp16=(dtype == jnp.bfloat16))

        @jax.jit
        def forward(x):
            return bundle.generator.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=False)

        return forward

    body_params = params["body"]
    body_stats = batch_stats.get("body", {}) if batch_stats else {}

    @jax.jit
    def forward(x):
        h = body.apply({"params": body_params, "batch_stats": body_stats},
                       x, train=False)
        return tail(h)

    return forward
