#!/usr/bin/env python
"""Inference smoke/comparison harness (reference surface:
/root/reference/unit_test.py).

Like the reference's "unit_test": runs the trained generator on 256x256
top-left crops of `--image_dir` PNGs and writes `*_sr.png` plus a classical
median-blur denoise comparison `*_sr_denoise.png`
(/root/reference/unit_test.py:54-119).  The real automated test suite lives
in tests/ (pytest).  Faithful quirk kept: inputs feed in [0, 1]
(/root/reference/unit_test.py:73) with outputs mapped (out+1)/2.
"""

from __future__ import annotations

import glob
import os
from argparse import ArgumentParser

import numpy as np

from denoise_gan_tpu.data.pipeline import decode_image
from denoise_gan_tpu.infer.image import build_forward, save_image_bgr
from denoise_gan_tpu.utils.config import get_path


def denoise_median(img01: np.ndarray, k: int = 3) -> np.ndarray:
    import cv2
    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    return cv2.medianBlur(arr, k).astype(np.float32) / 255.0


def denoise_nlmeans(img01: np.ndarray, strength: float = 10.0) -> np.ndarray:
    """The reference's other classical wrapper
    (/root/reference/unit_test.py:32-34, unused there; kept for surface
    parity behind --denoiser nlmeans)."""
    import cv2
    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    out = cv2.fastNlMeansDenoisingColored(arr, None, strength, strength, 7, 21)
    return out.astype(np.float32) / 255.0


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--image_dir", default="test/images", type=str)
    parser.add_argument("--model", default="./models/autoencoder.dgt", type=str)
    parser.add_argument("--crop", default=256, type=int)
    parser.add_argument("--denoiser", default="median",
                        choices=["median", "nlmeans"],
                        help="classical comparison filter (additive flag; "
                             "the reference calls only medianBlur)")
    args = parser.parse_args(argv)
    denoise = denoise_median if args.denoiser == "median" else denoise_nlmeans

    import jax.numpy as jnp
    _, _, forward = build_forward(get_path(args.model))
    paths = sorted(glob.glob(os.path.join(get_path(args.image_dir), "*.png")))
    for path in paths:
        img = decode_image(path)[:args.crop, :args.crop, :]
        out = forward(jnp.asarray(img)[None])[0]
        sr = (np.asarray(out, np.float32) + 1.0) / 2.0
        stem = os.path.splitext(path)[0]
        save_image_bgr(stem + "_sr.png", sr)
        save_image_bgr(stem + "_sr_denoise.png", denoise(sr))
        print(f"{path}: wrote {stem}_sr.png, {stem}_sr_denoise.png")


if __name__ == "__main__":
    main()
