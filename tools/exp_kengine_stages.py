#!/usr/bin/env python
"""Per-stage timing of the kernel-engine pipeline at 1080p (PERF.md r2):
pad+extract | body(144x124) vs body(112x144) | make_h3 | tail kernel |
canvas slice + u8 flat.  Rotating distinct inputs (CLAUDE.md timing rule).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_kengine_stages.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args_list, n=24, label=""):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    out = None
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    from denoise_gan_tpu.infer.engine import extract_grid
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.fsrgan import FSRGANBody, FSRGANTail
    from denoise_gan_tpu.ops.pallas.tail import (
        CORE, T, build_tail_call, make_h3, prep_weights)

    H, W = 1080, 1920
    ny, nx = 9, 16
    N = ny * nx
    stride = CORE
    m0 = (T - stride) // 2
    pad_h = (ny - 1) * stride + T
    pad_w = (nx - 1) * stride + T

    bundle = build_models("fsrgan", scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, T, T, 3), jnp.float32), train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    body = FSRGANBody(dtype=jnp.bfloat16)
    body_p, body_s = params["body"], stats.get("body", {})
    body_fn = jax.jit(lambda x: body.apply(
        {"params": body_p, "batch_stats": body_s}, x, train=False))

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    @jax.jit
    def pad_extract(frame01):
        x = frame01 * 2.0 - 1.0
        x = jnp.pad(x, ((m0, pad_h - H - m0), (m0, pad_w - W - m0), (0, 0)),
                    mode="edge")
        return extract_grid(x, ny, nx, T, stride)

    tiles = [pad_extract(f) for f in frames]
    timeit(pad_extract, [(f,) for f in frames], label="pad+extract 144x124")

    timeit(body_fn, [(t,) for t in tiles], label="body 144x124^2")
    tiles144 = [jnp.asarray(rng.standard_normal((112, 144, 144, 3)),
                            jnp.float32) * 0.5 for _ in range(2)]
    timeit(body_fn, [(t,) for t in tiles144], label="body 112x144^2")

    hs = [body_fn(t) for t in tiles]
    for prep in ("transpose", "conv"):
        h3fn = jax.jit(lambda h, p=prep: make_h3(h, p))
        timeit(h3fn, [(h,) for h in hs], label=f"make_h3 {prep}")

    weights = prep_weights(params["tail"])
    call = build_tail_call(weights, ny, nx, brc=8)
    h3s = [jax.jit(make_h3)(h) for h in hs]
    kfn = jax.jit(call)
    timeit(kfn, [(h,) for h in h3s], label="tail kernel brc=8")

    canvases = [kfn(h) for h in h3s]

    @jax.jit
    def out_path(canvas):
        c = canvas[:, :, 3:123, :].reshape(ny * CORE, nx * CORE, 48)
        out01 = jnp.clip((c.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        out01 = (out01 * 255.0 + 0.5).astype(jnp.uint8)
        hc, wc = out01.shape[:2]
        flat = out01.reshape(hc, wc, 4, 12)
        flat = flat.transpose(0, 2, 1, 3).reshape(hc * 4, wc * 12)
        return flat[:H * 4, :W * 12]

    timeit(out_path, [(c,) for c in canvases], label="canvas->u8 flat")

    @jax.jit
    def out_path_bf16(canvas):
        c = canvas[:, :, 3:123, :].reshape(ny * CORE, nx * CORE, 48)
        out01 = jnp.clip((c + 1.0) / 2.0, 0.0, 1.0)
        out01 = (out01 * 255.0 + 0.5).astype(jnp.uint8)
        hc, wc = out01.shape[:2]
        flat = out01.reshape(hc, wc, 4, 12)
        flat = flat.transpose(0, 2, 1, 3).reshape(hc * 4, wc * 12)
        return flat[:H * 4, :W * 12]

    timeit(out_path_bf16, [(c,) for c in canvases],
           label="canvas->u8 flat (bf16 affine)")


if __name__ == "__main__":
    main()
