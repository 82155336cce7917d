#!/usr/bin/env python
"""CLI shim for the pix2pix trainer, preserving the reference's flags and
defaults (/root/reference/train_pix2pix.py) on the TPU-native stack."""

from denoise_gan_tpu.train.loop import main

if __name__ == "__main__":
    main("pix2pix")
