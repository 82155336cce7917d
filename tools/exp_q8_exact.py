#!/usr/bin/env python
"""Kernel-engine modes vs the EXACT whole-frame output (PERF.md r3/r5).

exp_q8_engine.py measured q8-vs-bf16-kernel; this closes the chain by
scoring the kernel engines against the same whole-frame no-tiling engine
used as "exact" in round 2 (tools/exp_crop_stitch.py), so every mode's
number is directly comparable to the crop-stitch engine's accepted
<=1-level/~1.4% envelope.

Modes scored per family (VERDICT r3 #4 / r4 #6):
  bf16   — plain bf16 tail kernel
  q8     — w8a8 tail (int8 up2/final dots), static scales from a calib frame
  qh8    — q8 + int8 h3 DMA + w8a8 up1 (a third static calibration)
  u8q8   — q8 + the production u8/BGR input path (u8_input+bgr_input+bgr
           out, exactly as infer_video builds it)
Plus a SCENE-CHANGE stress row for q8/qh8: scales calibrated on a uniform-
noise frame, evaluated on a structured high-contrast frame (gradients +
saturated blocks) — the static-calibration exposure ADVICE r3 flagged.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_q8_exact.py [fsrgan|srgan|both]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def _structured_frame(h: int, w: int) -> np.ndarray:
    """High-contrast structured frame: smooth gradients, saturated blocks,
    and a hard edge — activation statistics far from uniform noise."""
    y = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    r = y * np.ones_like(x)
    g = np.ones_like(y) * x
    b = 0.5 + 0.5 * np.sin(12.0 * np.pi * (x + y))
    im = np.stack([r, g, b], axis=-1)
    im[: h // 4, : w // 4] = 1.0            # saturated white block
    im[-h // 4:, -w // 4:] = 0.0            # black block
    im[h // 2:, : w // 2, 0] = 1.0          # hard red edge
    return im.astype(np.float32)


def _score(got: np.ndarray, exact: np.ndarray, label: str) -> None:
    d = np.abs(got.astype(np.int32) - exact.astype(np.int32))
    print(f"{label}: max={d.max()} frac>0={(d > 0).mean():.5f} "
          f"frac>1={(d > 1).mean():.5f}", flush=True)


def run_family(family: str):
    from denoise_gan_tpu.infer.engine import build_frame_engine
    from denoise_gan_tpu.infer.fast import build_fast_coarse
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine, flat_view)
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models(family, scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    # u8-representable frame so the u8-input variant sees the identical
    # pixels the exact oracle sees
    frame_u8 = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frame = jnp.asarray(frame_u8.astype(np.float32) / 255.0)

    fwd, scale = build_fast_coarse({"family": family, "scale": 4},
                                   params, stats, out_dtype=jnp.bfloat16)
    eng_whole = build_frame_engine(fwd, H, W, scale, 0, out_uint8=True,
                                   flat_channels=True,
                                   acc_dtype=jnp.bfloat16)

    def exact_of(f01):
        return np.asarray(eng_whole(jnp.asarray(f01))).astype(np.int32)

    exact = exact_of(frame)

    build = (build_fsrgan_kernel_engine if family == "fsrgan"
             else build_srgan_kernel_engine)
    for label, kw in (("bf16", {}),
                      ("q8", dict(q8_calib_frame=frame)),
                      ("qh8", dict(q8_calib_frame=frame, qh8=True))):
        eng = build(params, stats, H, W, **kw)
        got = flat_view(eng(frame), H, W)
        _score(got, exact, f"{family} kernel[{label}] vs exact")

    # production u8/BGR input path (infer/video.py:195-210): BGR u8 frame
    # in, BGR bytes out — compare against the byte-reordered oracle
    eng_u8 = build(params, stats, H, W, q8_calib_frame=frame,
                   u8_input=True, bgr_input=True, bgr=True)
    got_bgr = flat_view(eng_u8(jnp.asarray(frame_u8[..., ::-1])), H, W)
    exact_bgr = np.ascontiguousarray(
        exact.reshape(H * 4, W * 4, 3)[..., ::-1]).reshape(H * 4, W * 4 * 3)
    _score(got_bgr, exact_bgr, f"{family} kernel[u8q8-bgr] vs exact")

    # scene-change stress: STATIC scales calibrated on the noise frame,
    # evaluated on a structured frame with very different statistics
    frame_b = _structured_frame(H, W)
    exact_b = exact_of(frame_b)
    for label, kw in (("q8", dict(q8_calib_frame=frame)),
                      ("qh8", dict(q8_calib_frame=frame, qh8=True))):
        eng = build(params, stats, H, W, **kw)
        got = flat_view(eng(jnp.asarray(frame_b)), H, W)
        _score(got, exact_b,
               f"{family} kernel[{label}] SCENE-CHANGE vs exact")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    for fam in fams:
        run_family(fam)


if __name__ == "__main__":
    main()
