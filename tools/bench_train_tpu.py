#!/usr/bin/env python
"""Training-step throughput across all four families on the local TPU chip
(bf16, crop 256).  Counterpart of tools/bench_train_tf_cpu.py; results in
PERF.md.  Run from the repo root."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.models import build_models
from denoise_gan_tpu.models.vgg import init_vgg_params
from denoise_gan_tpu.train.state import create_train_state
from denoise_gan_tpu.train.step import build_train_step, jit_train_step
from denoise_gan_tpu.utils.config import make_config


def main():
    for family, scale, bs in [("fsrgan", 4, 8), ("srgan", 4, 8),
                              ("autoencoder", 1, 4), ("pix2pix", 1, 4)]:
        cfg = make_config(family)
        cfg.crop_size = 256
        cfg.scale = scale
        cfg.batch_size = bs
        cfg.fp16 = 1
        cfg.finalize()
        bundle = build_models(family, scale=cfg.scale, fp16=True)
        state = create_train_state(bundle, cfg, jax.random.key(0))
        vgg = init_vgg_params()
        step = jit_train_step(build_train_step(bundle, cfg))
        rng = np.random.default_rng(0)
        batches = [jnp.asarray(rng.random((bs, 256, 256, 3)), jnp.float32)
                   for _ in range(4)]
        state, m = step(state, vgg, batches[0], jax.random.key(1))
        jax.block_until_ready(m)
        n = 20
        t0 = time.time()
        for i in range(n):
            state, m = step(state, vgg, batches[i % 4], jax.random.key(1))
        jax.block_until_ready(m)
        dt = (time.time() - t0) / n
        print(f"{family}: {1/dt:.2f} steps/s, {bs/dt:.1f} imgs/s "
              f"(bs={bs}, crop=256, bf16)", flush=True)


if __name__ == "__main__":
    main()
