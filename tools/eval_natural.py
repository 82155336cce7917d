#!/usr/bin/env python
"""Natural-image quality eval (VERDICT r3 weak #4: every quality number so
far was synthetic-corpus only — "no natural-image result exists anywhere").

This no-egress environment ships no datasets, but real PHOTOGRAPHS are
bundled with installed packages (sklearn's china/flower, matplotlib's
grace_hopper).  This tool scores a trained generator on overlapping 256^2
crops of those photos, degraded by the EXACT host libjpeg round trip
(native/imgcodec.cpp — real JPEG artifacts, not the on-device DCT
approximation used in training), vs the degraded-input baseline:

  center-crop grid (stride 128) -> bicubic downscale by the model's scale
  (tf.image semantics, /root/reference/dataloader.py:121-123) -> uint8 ->
  libjpeg q -> [-1,1] -> generator -> PSNR/SSIM vs clean.

Usage (CPU or chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_natural.py \
      --model /tmp/h2h_r3/models/h2h_autoencoder.dgt --qs 10,30,50
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

EVAL_CROP = 256
STRIDE = 128

# Real photographs bundled with installed packages (checked at runtime).
PHOTO_PATHS = [
    ("china", "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/"
     "images/china.jpg"),
    ("flower", "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/"
     "images/flower.jpg"),
    ("hopper", "/opt/venv/lib/python3.12/site-packages/matplotlib/"
     "mpl-data/sample_data/grace_hopper.jpg"),
]


def load_photo_crops():
    """(name, crop01) pairs: all 256^2 crops on a stride-128 grid."""
    from PIL import Image

    out = []
    for name, path in PHOTO_PATHS:
        if not os.path.exists(path):
            continue
        im = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        h, w = im.shape[:2]
        if h < EVAL_CROP or w < EVAL_CROP:
            continue
        for y in range(0, h - EVAL_CROP + 1, STRIDE):
            for x in range(0, w - EVAL_CROP + 1, STRIDE):
                out.append((name,
                            im[y:y + EVAL_CROP, x:x + EVAL_CROP]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--qs", default="10,30,50")
    p.add_argument("--photos", default="",
                   help="comma list restricting the eval sources (e.g. "
                        "'hopper' to score only the photo held out from "
                        "tools/train_natural.py's corpus)")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (e.g. cpu while the chip is "
                        "down — quality eval is timing-insensitive)")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from denoise_gan_tpu.data import native
    from denoise_gan_tpu.infer.image import build_forward
    from denoise_gan_tpu.ops.image import resize_bicubic
    from denoise_gan_tpu.ops.metrics import psnr, ssim

    assert native.available(), "native codec required (make -C native)"
    config, bundle, forward = build_forward(args.model, fast=False)
    scale = config["scale"] if bundle.upscales else 1

    crops = load_photo_crops()
    if args.photos:
        keep = set(args.photos.split(","))
        crops = [(n, c) for n, c in crops if n in keep]
    assert crops, "no bundled photographs found on this system"
    names = sorted({n for n, _ in crops})
    hr01 = np.stack([c for _, c in crops])
    srcs = np.array([names.index(n) for n, _ in crops])

    if scale > 1:
        s = EVAL_CROP // scale
        lo01 = tf.image.resize(tf.constant(hr01), [s, s],
                               method="bicubic").numpy()
    else:
        lo01 = hr01
    lo_u8 = np.clip(np.round(lo01 * 255.0), 0, 255).astype(np.uint8)

    @jax.jit
    def run_on(lo_m11, hi01):
        out01 = jnp.clip((forward(lo_m11) + 1.0) / 2.0, 0.0, 1.0)
        lo01d = (lo_m11 + 1.0) / 2.0
        if scale > 1:
            h = hi01.shape[1]
            bar01 = jnp.clip(resize_bicubic(lo01d, h, h), 0.0, 1.0)
        else:
            bar01 = lo01d
        return (psnr(out01, hi01), ssim(out01, hi01),
                psnr(bar01, hi01), ssim(bar01, hi01))

    def score(lo_m11_np):
        outs = [[np.asarray(v) for v in
                 run_on(jnp.asarray(lo_m11_np[i:i + 8]),
                        jnp.asarray(hr01[i:i + 8]))]
                for i in range(0, len(lo_m11_np), 8)]
        return [np.concatenate([o[k] for o in outs]) for k in range(4)]

    print(f"model: {args.model}  scale={scale}  "
          f"crops={len(crops)} from {len(names)} photos: {names}")
    print("\n| q | model PSNR/SSIM | input PSNR/SSIM | dPSNR | dSSIM | "
          "per-photo dPSNR |")
    print("|---|---|---|---|---|---|")
    for q in [int(x) for x in args.qs.split(",")]:
        jl = np.stack([native.jpeg_roundtrip_u8(im, q) for im in lo_u8])
        lo_lib = (jl.astype(np.float32) / 255.0) * 2.0 - 1.0
        pm, sm, pi, si = score(lo_lib)
        per = " ".join(
            f"{names[k]}:{(pm[srcs == k].mean() - pi[srcs == k].mean()):+.2f}"
            for k in range(len(names)))
        print(f"| {q} | {pm.mean():.2f} / {sm.mean():.4f} "
              f"| {pi.mean():.2f} / {si.mean():.4f} "
              f"| **{pm.mean()-pi.mean():+.2f}** "
              f"| **{sm.mean()-si.mean():+.4f}** | {per} |")


if __name__ == "__main__":
    main()
