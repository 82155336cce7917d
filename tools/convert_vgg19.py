#!/usr/bin/env python
"""Convert pretrained VGG19 ImageNet weights to the denoise_gan_tpu .npz
format consumed by models/vgg.py (SURVEY.md §7 "VGG19 pretrained weights").

Sources (first available wins):
  1. --h5: a Keras `vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5`
  2. --torch: a torchvision `vgg19-*.pth` state dict (weights are converted
     OIHW->HWIO; note torchvision VGG19 is trained on [0,1]-normalized inputs
     with different preprocessing — prefer the Keras h5 for exact parity with
     the reference's content loss)
  3. keras.applications download (needs network egress)

Output keys: conv{block}_{idx}/kernel (HWIO) and conv{block}_{idx}/bias.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Keras layer names in order -> our names
KERAS_NAMES = [
    ("block1_conv1", "conv1_1"), ("block1_conv2", "conv1_2"),
    ("block2_conv1", "conv2_1"), ("block2_conv2", "conv2_2"),
    ("block3_conv1", "conv3_1"), ("block3_conv2", "conv3_2"),
    ("block3_conv3", "conv3_3"), ("block3_conv4", "conv3_4"),
    ("block4_conv1", "conv4_1"), ("block4_conv2", "conv4_2"),
    ("block4_conv3", "conv4_3"), ("block4_conv4", "conv4_4"),
    ("block5_conv1", "conv5_1"), ("block5_conv2", "conv5_2"),
    ("block5_conv3", "conv5_3"), ("block5_conv4", "conv5_4"),
]


def from_h5(path: str) -> dict[str, np.ndarray]:
    import h5py
    out = {}
    with h5py.File(path, "r") as f:
        for keras_name, ours in KERAS_NAMES:
            grp = f[keras_name] if keras_name in f else f["model_weights"][keras_name]
            # keras h5 layout: <layer>/<layer>_W_1:0 or <layer>/kernel:0 variants
            def find(suffix):
                for k in grp.keys():
                    sub = grp[k]
                    if hasattr(sub, "keys"):
                        for kk in sub.keys():
                            if suffix in kk:
                                return np.asarray(sub[kk])
                    elif suffix in k:
                        return np.asarray(sub)
                raise KeyError(f"{keras_name}: no dataset matching {suffix}")
            out[f"{ours}/kernel"] = find("kernel")
            out[f"{ours}/bias"] = find("bias")
    return out


def from_torch(path: str) -> dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu")
    conv_keys = [k[:-7] for k in sd if k.endswith(".weight")
                 and sd[k].ndim == 4]
    conv_keys.sort(key=lambda k: int(k.split(".")[1]))
    out = {}
    for (_, ours), key in zip(KERAS_NAMES, conv_keys):
        w = sd[key + ".weight"].numpy()          # OIHW
        out[f"{ours}/kernel"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        out[f"{ours}/bias"] = sd[key + ".bias"].numpy()
    return out


def from_keras_download() -> dict[str, np.ndarray]:
    from tensorflow.keras.applications import VGG19
    model = VGG19(weights="imagenet", include_top=False)
    out = {}
    for keras_name, ours in KERAS_NAMES:
        w, b = model.get_layer(keras_name).get_weights()
        out[f"{ours}/kernel"] = w
        out[f"{ours}/bias"] = b
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--h5", default="", help="Keras VGG19 notop .h5")
    p.add_argument("--torch", default="", help="torchvision vgg19 .pth")
    p.add_argument("--out", default="models/vgg19_notop.npz")
    args = p.parse_args()

    if args.h5:
        weights = from_h5(args.h5)
    elif args.torch:
        weights = from_torch(args.torch)
    else:
        print("no local source given; trying keras download...")
        weights = from_keras_download()

    for (_, ours) in KERAS_NAMES:
        k = weights[f"{ours}/kernel"]
        assert k.ndim == 4 and k.shape[0] == 3 and k.shape[1] == 3, k.shape
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **weights)
    print(f"wrote {args.out} ({len(weights)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
