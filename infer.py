#!/usr/bin/env python
"""CLI shim: still-image inference (reference surface: /root/reference/infer.py)."""

from denoise_gan_tpu.infer.image import main

if __name__ == "__main__":
    main()
