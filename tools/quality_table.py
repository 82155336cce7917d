#!/usr/bin/env python
"""Quality table (VERDICT r1 #3): train EVERY family a fixed budget on a
synthetic corpus and report PSNR/SSIM vs the degraded-input baseline.

The corpus is structured (smooth gradients + shapes + mild texture), so the
denoising task is learnable; degradation is the training pipeline itself
(bicubic downscale by `scale` + JPEG at `q`).  The reference computes no
quality metrics at all (SURVEY.md §6) — this creates the numbers.

Usage (on the TPU chip, ~30-40 min total):
  cd /tmp/quality_r2 && PYTHONPATH=/root/repo:/root/.axon_site \
    python /root/repo/tools/quality_table.py [--families fsrgan,srgan,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def synth_image(rng: np.random.Generator, size: int = 288) -> np.ndarray:
    """Structured synthetic image: low-frequency background + shapes."""
    import cv2
    base = rng.uniform(0, 1, (9, 9, 3)).astype(np.float32)
    img = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    for _ in range(rng.integers(4, 10)):
        color = rng.uniform(0, 1, 3).astype(float)
        kind = rng.integers(0, 3)
        if kind == 0:
            x0, y0 = rng.integers(0, size - 20, 2)
            w, h = rng.integers(10, size // 2, 2)
            cv2.rectangle(img, (int(x0), int(y0)),
                          (int(min(x0 + w, size - 1)),
                           int(min(y0 + h, size - 1))), color.tolist(), -1)
        elif kind == 1:
            c = rng.integers(20, size - 20, 2)
            cv2.circle(img, (int(c[0]), int(c[1])),
                       int(rng.integers(8, size // 4)), color.tolist(), -1)
        else:
            p1 = rng.integers(0, size, 2)
            p2 = rng.integers(0, size, 2)
            cv2.line(img, tuple(int(v) for v in p1),
                     tuple(int(v) for v in p2), color.tolist(),
                     int(rng.integers(1, 6)))
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)  # mild texture
    return np.clip(img, 0, 1).astype(np.float32)


def make_corpus(root: str, n_train: int = 240, n_val: int = 32) -> None:
    rng = np.random.default_rng(7)
    for split, n in [("train", n_train), ("val", n_val)]:
        d = os.path.join(root, split, "imgs")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            np.save(os.path.join(d, f"im{i:04d}.npy"), synth_image(rng))
    print(f"corpus at {root}: {n_train} train / {n_val} val", flush=True)


FAMILY_CFG = {
    # (crop, batch, scale, jpeg_quality, epochs)
    "autoencoder": (128, 8, 1, 10, 100),
    "pix2pix": (256, 4, 1, 10, 50),
    "srgan": (128, 8, 4, 50, 100),
    "fsrgan": (128, 8, 4, 50, 100),
}


def run_family(family: str, data_root: str) -> dict:
    from denoise_gan_tpu.train.loop import train
    from denoise_gan_tpu.utils.config import make_config

    crop, batch, scale, q, epochs = FAMILY_CFG[family]
    cfg = make_config(family, image_dir=os.path.join(data_root, "train"))
    cfg.crop_size = crop
    cfg.batch_size = batch
    cfg.scale = scale
    cfg.jpeg_quality = q
    cfg.epochs = epochs
    cfg.retrain = 0
    cfg.ckpt = 0
    cfg.log_images = 0
    cfg.save_iter = 10 ** 9  # clamped to steps/epoch by train()
    cfg.finalize()
    cfg.suffix_model_name()

    t0 = time.time()
    train(cfg, family)
    train_s = time.time() - t0

    # evaluate on the held-out split (same scoring as tools/evaluate.py)
    from denoise_gan_tpu.infer.image import build_forward
    import jax
    import jax.numpy as jnp
    from denoise_gan_tpu.data.degrade import degrade_pair
    from denoise_gan_tpu.data.pipeline import DataPipeline
    from denoise_gan_tpu.ops.image import resize_bicubic
    from denoise_gan_tpu.ops.metrics import psnr, ssim
    from denoise_gan_tpu.utils.config import make_config as mc

    config, bundle, forward = build_forward(
        os.path.join("models", f"{cfg.model_name}.dgt"), fast=False)
    vcfg = mc("autoencoder", image_dir=os.path.join(data_root, "val"))
    vcfg.crop_size = crop
    vcfg.batch_size = 8
    vcfg.finalize()
    pipe = DataPipeline(vcfg)

    @jax.jit
    def eval_batch(hr01):
        lo, hi = degrade_pair(hr01, scale, q)
        out01 = jnp.clip((forward(lo) + 1.0) / 2.0, 0.0, 1.0)
        clean01 = (hi + 1.0) / 2.0
        if scale > 1:
            h, w = hr01.shape[1:3]
            bar01 = jnp.clip(resize_bicubic((lo + 1.0) / 2.0, h, w), 0.0, 1.0)
        else:
            bar01 = (lo + 1.0) / 2.0
        return (psnr(out01, clean01), ssim(out01, clean01),
                psnr(bar01, clean01), ssim(bar01, clean01))

    stats = [[np.asarray(x) for x in eval_batch(jnp.asarray(hr))]
             for hr in pipe.epoch()]
    po, so, pb, sb = (np.concatenate([s[k] for s in stats]) for k in range(4))
    res = dict(family=family, scale=scale, q=q,
               steps=epochs * (240 // batch), train_s=round(train_s, 1),
               psnr_model=round(float(po.mean()), 2),
               ssim_model=round(float(so.mean()), 4),
               psnr_input=round(float(pb.mean()), 2),
               ssim_input=round(float(sb.mean()), 4))
    print("RESULT", res, flush=True)
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="autoencoder,pix2pix,srgan,fsrgan")
    p.add_argument("--data_root", default="qdata")
    p.add_argument("--epochs", type=int, default=0,
                   help="override the per-family epoch budget")
    p.add_argument("--smoke", action="store_true",
                   help="tiny corpus + 1 epoch (CPU shake-out)")
    args = p.parse_args()

    if args.epochs:
        for k, (c, b, s, q, _) in FAMILY_CFG.items():
            FAMILY_CFG[k] = (c, b, s, q, args.epochs)
    if args.smoke:
        for k, (c, b, s, q, _) in FAMILY_CFG.items():
            FAMILY_CFG[k] = (c, b, s, q, 1)

    if not os.path.exists(args.data_root):
        make_corpus(args.data_root, n_train=16 if args.smoke else 240,
                    n_val=8 if args.smoke else 32)

    rows = []
    for fam in args.families.split(","):
        rows.append(run_family(fam.strip(), args.data_root))

    print("\n| Family | scale/q | steps | PSNR model | PSNR input | dPSNR |"
          " SSIM model | SSIM input | dSSIM |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['family']} | {r['scale']}x/q{r['q']} | {r['steps']} "
              f"| {r['psnr_model']} | {r['psnr_input']} "
              f"| **{r['psnr_model']-r['psnr_input']:+.2f}** "
              f"| {r['ssim_model']} | {r['ssim_input']} "
              f"| **{r['ssim_model']-r['ssim_input']:+.4f}** |")


if __name__ == "__main__":
    main()
