#!/usr/bin/env python
"""Cross-oracle quality eval (VERDICT r2 #3): score trained models on
held-out data degraded by the EXACT host libjpeg round trip
(native/imgcodec.cpp) instead of the on-device DCT approximation the models
were trained with (ops/jpeg.py), at the training quality AND off-training
qualities — does the DCT noise model generalize to real JPEG artifacts?

Pipeline per quality q: center-crop 256 of each val image -> bicubic
downscale by the model's scale (tf.image, the reference semantics,
/root/reference/dataloader.py:121-123) -> uint8 -> libjpeg encode/decode at
q (native.jpeg_roundtrip_u8) -> [-1,1] -> generator -> PSNR/SSIM vs clean,
next to the degraded-input baseline and the on-device DCT-oracle scores on
the same inputs.

Usage (on the TPU chip or CPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/cross_oracle_eval.py \
      --model models/h2h_fsrgan.dgt --qs 30,50,70
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

EVAL_CROP = 256


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--data_root", default="/tmp/h2h_r3/qdata")
    p.add_argument("--qs", default="30,50,70")
    args = p.parse_args()

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf
    import jax
    import jax.numpy as jnp
    from denoise_gan_tpu.data import native
    from denoise_gan_tpu.infer.image import build_forward
    from denoise_gan_tpu.ops.image import resize_bicubic
    from denoise_gan_tpu.ops.jpeg import jpeg_roundtrip
    from denoise_gan_tpu.ops.metrics import psnr, ssim
    from h2h_tf_reference import _ensure_corpus, _load_split

    assert native.available(), "native codec required (make -C native)"
    config, bundle, forward = build_forward(args.model, fast=False)
    scale = config["scale"] if bundle.upscales else 1

    _ensure_corpus(args.data_root)
    val = _load_split(args.data_root, "val")
    off = (val.shape[1] - EVAL_CROP) // 2
    hr01 = val[:, off:off + EVAL_CROP, off:off + EVAL_CROP, :]
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

    @jax.jit
    def dct_degrade(lo01f, q):
        return jpeg_roundtrip(lo01f, q) * 2.0 - 1.0

    def score(lo_m11_np):
        outs = [[np.asarray(v) for v in
                 run_on(jnp.asarray(lo_m11_np[i:i + 8]),
                        jnp.asarray(hr01[i:i + 8]))]
                for i in range(0, len(lo_m11_np), 8)]
        return [float(np.concatenate([o[k] for o in outs]).mean())
                for k in range(4)]

    print(f"model: {args.model}  scale={scale}  "
          f"(train oracle: on-device DCT approx)")
    print("\n| oracle | q | model PSNR/SSIM | input PSNR/SSIM | dPSNR | dSSIM |")
    print("|---|---|---|---|---|---|")
    for q in [int(x) for x in args.qs.split(",")]:
        # exact host libjpeg round trip
        jl = np.stack([native.jpeg_roundtrip_u8(im, q) for im in lo_u8])
        lo_lib = (jl.astype(np.float32) / 255.0) * 2.0 - 1.0
        pm, sm, pi, si = score(lo_lib)
        print(f"| libjpeg | {q} | {pm:.2f} / {sm:.4f} | {pi:.2f} / {si:.4f} "
              f"| **{pm-pi:+.2f}** | **{sm-si:+.4f}** |")
        # on-device DCT approximation (the training-time oracle)
        lo_dct = np.asarray(dct_degrade(jnp.asarray(lo01), q))
        pm, sm, pi, si = score(lo_dct)
        print(f"| dct-dev | {q} | {pm:.2f} / {sm:.4f} | {pi:.2f} / {si:.4f} "
              f"| {pm-pi:+.2f} | {sm-si:+.4f} |")


if __name__ == "__main__":
    main()
