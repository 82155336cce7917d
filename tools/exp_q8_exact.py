#!/usr/bin/env python
"""q8 kernel engine vs EXACT whole-frame output (PERF.md r3).

exp_q8_engine.py measured q8-vs-bf16-kernel; this closes the chain by
scoring BOTH kernel engines (bf16 tail, w8a8 tail) against the same
whole-frame no-tiling engine used as "exact" in round 2
(tools/exp_crop_stitch.py), so the q8 number is directly comparable to the
crop-stitch engine's accepted <=1-level/~1.4% envelope.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_q8_exact.py [fsrgan|srgan|both]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def run_family(family: str):
    from denoise_gan_tpu.infer.engine import build_frame_engine
    from denoise_gan_tpu.infer.fast import build_fast_coarse
    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine, flat_view)
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models(family, scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((H, W, 3)), jnp.float32)

    fwd, scale = build_fast_coarse({"family": family, "scale": 4},
                                   params, stats, out_dtype=jnp.bfloat16)
    eng_whole = build_frame_engine(fwd, H, W, scale, 0, out_uint8=True,
                                   flat_channels=True,
                                   acc_dtype=jnp.bfloat16)
    exact = np.asarray(eng_whole(frame)).astype(np.int32)

    build = (build_fsrgan_kernel_engine if family == "fsrgan"
             else build_srgan_kernel_engine)
    for label, kw in (("bf16", {}), ("q8", dict(q8_calib_frame=frame))):
        eng = build(params, stats, H, W, **kw)
        # the kernel emits the raw 5D u8 contract; flat_view is the
        # zero-copy (H*4, W*4*3) byte view the CLI consumes
        got = flat_view(eng(frame), H, W).astype(np.int32)
        d = np.abs(got - exact)
        print(f"{family} kernel[{label}] vs exact whole-frame: "
              f"max={d.max()} frac>0={(d > 0).mean():.5f} "
              f"frac>1={(d > 1).mean():.5f}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    fams = ["fsrgan", "srgan"] if which == "both" else [which]
    for fam in fams:
        run_family(fam)


if __name__ == "__main__":
    main()
