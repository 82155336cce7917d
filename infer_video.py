#!/usr/bin/env python
"""CLI shim: streaming video inference (reference surface:
/root/reference/infer_video.py)."""

from denoise_gan_tpu.infer.video import main

if __name__ == "__main__":
    main()
