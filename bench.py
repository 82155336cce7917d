#!/usr/bin/env python
"""Headline benchmark: 1080p overlap-tiled video denoising throughput,
frames/sec per chip, on the flagship FSRGAN generator (bf16 compute).

North-star metric from BASELINE.md: >30 fps 1080p denoise per chip on TPU
v5e.  Prints ONE JSON line:
  {"metric": "1080p_fps_per_chip", "value": N, "unit": "frames/sec",
   "vs_baseline": N/30}
(the reference publishes no numbers — SURVEY.md §6 — so vs_baseline is the
ratio to the driver-set 30 fps target).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import os

    from denoise_gan_tpu.infer.kernel_engine import build_fsrgan_kernel_engine
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    FRAMES = 32

    bundle = build_models("fsrgan", scale=4, fp16=True)
    x0 = jnp.zeros((1, 124, 124, 3), jnp.float32)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    # fused Pallas tail kernel engine (infer/kernel_engine.py): XLA body on
    # a <=128-tile grid + up1/up2/final-conv/tanh/crop-stitch/u8 in one
    # VMEM-resident kernel; output is the kernel's 5D uint8 whose C-order
    # bytes ARE the (H*4, W*4*3) HWC stream (kernel_engine.flat_view is a
    # zero-copy host flatten — the video CLI consumes it that way).
    # w8a8 tail (int8 up2/final dots, first frame as calibration) is the
    # DEFAULT — same as the video CLI: measured ~zero added deviation vs
    # the exact whole-frame output beyond the bf16 kernel's accepted
    # envelope (tools/exp_q8_exact.py) at 1.06x fps.  BENCH_Q8=0 reverts
    # to the bf16 tail.
    q8 = bool(int(os.environ.get("BENCH_Q8", "1")))
    denoise_frame = build_fsrgan_kernel_engine(
        variables["params"], variables.get("batch_stats", {}), H, W,
        q8_calib_frame=frames[0] if q8 else None)

    # warmup / compile
    denoise_frame(frames[0]).block_until_ready()

    t0 = time.time()
    out = None
    for i in range(FRAMES):
        out = denoise_frame(frames[i % 2])
    out.block_until_ready()
    elapsed = time.time() - t0
    fps = FRAMES / elapsed

    print(json.dumps({
        "metric": "1080p_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} frames={FRAMES} "
          f"elapsed={elapsed:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
