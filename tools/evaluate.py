#!/usr/bin/env python
"""Quality evaluation: mean PSNR/SSIM of a trained generator over a directory.

The reference computed no quality metrics at all (SURVEY.md §6); BASELINE.md
requires PSNR/SSIM.  For each image: degrade with the training pipeline
(bicubic downscale by the model's scale + JPEG at --jpeg_quality), run the
generator, and score output-vs-clean alongside the degraded-input-vs-clean
bar (for scale>1 the bar is the bicubic upscale of the degraded input).

Usage:
  python tools/evaluate.py --image_dir data/val --model models/fsrgan_4x_50q.dgt
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.data.degrade import degrade_pair
from denoise_gan_tpu.data.pipeline import DataPipeline
from denoise_gan_tpu.infer.image import build_forward
from denoise_gan_tpu.ops.image import resize_bicubic
from denoise_gan_tpu.ops.metrics import psnr, ssim
from denoise_gan_tpu.utils.config import get_path, make_config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--jpeg_quality", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--fast", type=int, default=1)
    args = p.parse_args(argv)

    config, bundle, forward = build_forward(get_path(args.model),
                                            fast=bool(args.fast))
    scale = config["scale"] if bundle.upscales else 1

    cfg = make_config("autoencoder", image_dir=get_path(args.image_dir))
    cfg.crop_size = args.crop_size
    cfg.batch_size = args.batch_size
    cfg.scale = scale
    cfg.jpeg_quality = args.jpeg_quality
    cfg.finalize()
    pipe = DataPipeline(cfg)

    @jax.jit
    def eval_batch(hr01):
        lo, hi = degrade_pair(hr01, scale, cfg.jpeg_quality)
        out01 = jnp.clip((forward(lo) + 1.0) / 2.0, 0.0, 1.0)
        clean01 = (hi + 1.0) / 2.0
        if scale > 1:
            h, w = hr01.shape[1:3]
            bar01 = jnp.clip(resize_bicubic((lo + 1.0) / 2.0, h, w), 0.0, 1.0)
        else:
            bar01 = (lo + 1.0) / 2.0
        return (psnr(out01, clean01), ssim(out01, clean01),
                psnr(bar01, clean01), ssim(bar01, clean01))

    stats = []
    for i, hr in enumerate(pipe.epoch()):
        if args.max_batches and i >= args.max_batches:
            break
        stats.append([np.asarray(x) for x in eval_batch(jnp.asarray(hr))])
    po, so, pb, sb = (np.concatenate([s[k] for s in stats]) for k in range(4))
    print(f"images: {len(po)}  (scale={scale}, q={cfg.jpeg_quality})")
    print(f"model  PSNR {po.mean():6.2f} dB   SSIM {so.mean():.4f}")
    print(f"input  PSNR {pb.mean():6.2f} dB   SSIM {sb.mean():.4f}  (degraded baseline)")
    print(f"delta  PSNR {po.mean()-pb.mean():+6.2f} dB   SSIM {so.mean()-sb.mean():+.4f}")


if __name__ == "__main__":
    main()
