#!/usr/bin/env python
"""Natural-image training demo (VERDICT r3 weak #4 follow-up).

tools/eval_natural.py showed the synthetic-corpus h2h models transfer
NEGATIVELY to real photographs (the synthetic corpus's structured-noise
statistics are not photographic texture).  This tool closes the loop with a
real-photo train/test split from the images bundled with installed
packages: train on overlapping crops of sklearn's china+flower, hold out
matplotlib's grace_hopper entirely, and score the held-out photo with
eval_natural.py --photos hopper (exact host libjpeg degradation).

  build : extract 288^2 tiles (stride 64) + horizontal flips from
          china+flower into --data_root/train/*.npy (the standard pipeline
          format; the 256 train crop is jittered inside each 288 tile)
  train : the REAL train() loop (autoencoder family by default, 1x, q10)
  (then) python tools/eval_natural.py --model models/nat_<family>.dgt \
             --photos hopper --qs 10,30,50 [--platform cpu]

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/train_natural.py \
      build && python tools/train_natural.py train --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

TILE = 288
STRIDE = 64

_SP = "/opt/venv/lib/python3.12/site-packages"
TRAIN_PHOTOS = {
    "china": f"{_SP}/sklearn/datasets/images/china.jpg",
    "flower": f"{_SP}/sklearn/datasets/images/flower.jpg",
}
# grace_hopper is the held-out eval photo (eval_natural.py --photos hopper)

# Photographic texture images bundled with installed simulation packages
# (curated by gradient energy / color diversity — real photos of wood,
# stone, skin, grass, sky; flat synthetic game tiles excluded).  The
# round-4 two-photo corpus overfit (+2.15 dB on its own photos, -3.45 dB
# on held-out hopper); these diversify the texture statistics.  Each entry
# is (path, tile stride) — big 1024^2 textures use a coarse stride so no
# single source dominates the corpus.
_KIT = f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures"
_ADR = f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures"
_DMC = f"{_SP}/dm_control"
TRAIN_TEXTURES = {
    "tile1": (f"{_KIT}/tile1.png", 112),
    "marble1": (f"{_KIT}/marble1.png", 112),
    "wmarble": (f"{_KIT}/white_marble_tile.png", 160),
    "wmarble2": (f"{_KIT}/white_marble_tile2.png", 192),
    "wood1": (f"{_KIT}/wood1.png", 192),
    "darkwood": (f"{_ADR}/darkwood.png", 192),
    "marble": (f"{_ADR}/marble.png", 112),
    "silver": (f"{_ADR}/silverRaw.png", 112),
    "foil": (f"{_ADR}/foil.png", 112),
    "handskin": (f"{_ADR}/skin.png", 192),
    "dogskin": (f"{_DMC}/suite/dog_assets/skin_texture.png", 192),
    "grass": (f"{_DMC}/locomotion/arenas/assets/outdoor_natural/"
              "OutdoorGrassFloorD.png", 112),
    "sky": (f"{_DMC}/locomotion/arenas/assets/outdoor_natural/"
            "OutdoorSkybox2048.png", 256),
}


def _tile_photo(out_dir: str, name: str, path: str, stride: int) -> int:
    from PIL import Image

    if not os.path.exists(path):
        print(f"skip {name}: {path} not found")
        return 0
    im = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    h, w = im.shape[:2]
    n = 0
    for y in range(0, h - TILE + 1, stride):
        for x in range(0, w - TILE + 1, stride):
            t = im[y:y + TILE, x:x + TILE]
            for k, v in (("", t), ("f", t[:, ::-1])):
                np.save(os.path.join(out_dir, f"{name}_{y}_{x}{k}.npy"),
                        np.ascontiguousarray(v))
                n += 1
    return n


def build(args) -> None:
    out_dir = os.path.join(args.data_root, "train", "photos")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name, path in TRAIN_PHOTOS.items():
        n += _tile_photo(out_dir, name, path, STRIDE)
    if args.textures:
        for name, (path, stride) in TRAIN_TEXTURES.items():
            n += _tile_photo(out_dir, name, path, stride)
    print(f"wrote {n} {TILE}^2 tiles to {out_dir}")


def train(args) -> None:
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from denoise_gan_tpu.train.loop import train as train_loop
    from denoise_gan_tpu.utils.config import make_config

    c = make_config(args.family,
                    image_dir=os.path.join(args.data_root, "train"))
    c.crop_size = args.crop
    c.batch_size = args.batch
    c.scale = args.scale
    c.jpeg_quality = args.q
    n_tiles = len(os.listdir(
        os.path.join(args.data_root, "train", "photos")))
    spe = n_tiles // args.batch
    c.epochs = max(1, round(args.steps / spe))
    c.retrain = 0
    c.ckpt = 0
    c.log_images = 0
    c.save_iter = 10 ** 9
    c.model_name = f"nat_{args.family}"
    c.finalize()
    print(f"natural train: {args.family} tiles={n_tiles} spe={spe} "
          f"epochs={c.epochs} (~{c.epochs * spe} steps) q={args.q} "
          f"scale={args.scale}", flush=True)
    train_loop(c, args.family)
    print(f"export: models/{c.model_name}.dgt", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["build", "train"])
    p.add_argument("--data_root", default="/tmp/nat")
    p.add_argument("--textures", type=int, default=1,
                   help="include the curated texture photos (0 = the "
                        "round-4 two-photo corpus)")
    p.add_argument("--family", default="autoencoder")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--crop", type=int, default=256,
                   help="train crop (128 keeps the CPU fallback affordable; "
                        "the models are fully convolutional, eval stays 256)")
    p.add_argument("--scale", type=int, default=1)
    p.add_argument("--q", type=int, default=10)
    p.add_argument("--platform", default="",
                   help="force a JAX platform (cpu while the chip is down)")
    args = p.parse_args()
    if args.cmd == "build":
        build(args)
    else:
        train(args)


if __name__ == "__main__":
    main()
