#!/usr/bin/env python
"""CLI shim for the fsrgan trainer, preserving the reference's flags and
defaults (/root/reference/train_fsrgan.py) on the TPU-native stack."""

from denoise_gan_tpu.train.loop import main

if __name__ == "__main__":
    main("fsrgan")
