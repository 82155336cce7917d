#!/usr/bin/env python
"""Per-stage timing: body vs tail vs stitch, tiled vs whole-frame (PERF.md).

Times each stage as its own jitted program with rotating distinct inputs
(the runtime elides repeats on identical buffers — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_stage_times.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_list, n=24, label=""):
    jax.block_until_ready(fn(*args_list[0]))  # compile
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    from denoise_gan_tpu.infer.engine import (
        build_frame_engine, extract_grid, overlap_add, _phase_feather, _grid)
    from denoise_gan_tpu.infer.fast import build_fast_coarse
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.fsrgan import FSRGANBody

    H, W = 1080, 1920
    TILE, OV = 144, 4
    stride = TILE - OV
    ny, nx = _grid(H, TILE, stride), _grid(W, TILE, stride)
    NT = ny * nx
    print(f"grid {ny}x{nx} = {NT} tiles of {TILE}")

    bundle = build_models("fsrgan", scale=4, fp16=True)
    x0 = jnp.zeros((1, TILE, TILE, 3), jnp.float32)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    fwd, scale = build_fast_coarse({"family": "fsrgan", "scale": 4},
                                   params, stats, out_dtype=jnp.bfloat16)

    body = FSRGANBody(dtype=jnp.bfloat16)
    body_p, body_s = params["body"], stats.get("body", {})

    from denoise_gan_tpu.infer.fast import build_coarse_tail
    tail_p = params["tail"]
    tail = build_coarse_tail(tail_p, ["up1", "up2"],
                             tail_p["out_conv"]["kernel"],
                             tail_p["out_conv"]["bias"],
                             jnp.bfloat16, final_d2s=False,
                             out_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)

    # ---- tiled stages
    tiles = [jnp.asarray(rng.standard_normal((NT, TILE, TILE, 3)),
                         jnp.float32) * 0.5 for _ in range(2)]
    h_tiles = [jnp.asarray(rng.standard_normal((NT, TILE, TILE, 32)),
                           jnp.bfloat16) for _ in range(2)]

    body_fn = jax.jit(lambda x: body.apply(
        {"params": body_p, "batch_stats": body_s}, x, train=False))
    tail_fn = jax.jit(tail)

    timeit(body_fn, [(t,) for t in tiles], label="body tiled 112x144")
    timeit(tail_fn, [(h,) for h in h_tiles], label="tail tiled 112x144")

    # ---- whole-frame stages
    Hp = 1088
    frames = [jnp.asarray(rng.standard_normal((1, Hp, W, 3)),
                          jnp.float32) * 0.5 for _ in range(2)]
    h_whole = [jnp.asarray(rng.standard_normal((1, Hp, W, 32)),
                           jnp.bfloat16) for _ in range(2)]
    timeit(body_fn, [(f,) for f in frames], label="body whole 1088x1920")
    timeit(tail_fn, [(h,) for h in h_whole], label="tail whole 1088x1920")

    # ---- engine overhead: extract + weight + overlap_add + u8/flat on
    # precomputed tail outputs
    cc = 48
    weight = jnp.asarray(_phase_feather(TILE, scale, OV, 3), jnp.bfloat16)
    pad_h = (ny - 1) * stride + TILE
    pad_w = (nx - 1) * stride + TILE
    outs = [jnp.asarray(rng.standard_normal((NT, TILE, TILE, cc)),
                        jnp.bfloat16) for _ in range(2)]
    inv = jax.jit(lambda: (1.0 / jnp.maximum(overlap_add(
        jnp.broadcast_to(weight.astype(jnp.float32), (NT, TILE, TILE, cc)),
        ny, nx, TILE, stride), 1e-8)).astype(jnp.bfloat16))()

    @jax.jit
    def stitch_only(out, inv):
        acc = overlap_add(out * weight, ny, nx, TILE, stride) * inv
        out01 = jnp.clip((acc + 1.0) / 2.0, 0.0, 1.0)
        out01 = (out01 * 255.0 + 0.5).astype(jnp.uint8)
        hc, wc = out01.shape[:2]
        flat = out01.reshape(hc, wc, scale, 3 * scale)
        flat = flat.transpose(0, 2, 1, 3).reshape(hc * scale, wc * 3 * scale)
        return flat[:H * scale, :W * scale * 3]

    @jax.jit
    def extract_only(frame01):
        x = frame01 * 2.0 - 1.0
        x = jnp.pad(x, ((0, pad_h - Hp), (0, pad_w - W), (0, 0)), mode="edge")
        return extract_grid(x, ny, nx, TILE, stride)

    timeit(stitch_only, [(o, inv) for o in outs], label="stitch+u8flat")
    timeit(extract_only, [(f[0],) for f in frames], label="pad+extract")


if __name__ == "__main__":
    main()
