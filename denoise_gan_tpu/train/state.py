"""Train state: generator + discriminator params, BatchNorm stats, optimizer
states, and a checkpointed step counter.

Optimizers mirror the reference:
* autoencoder/srgan/fsrgan: Adam on an ExponentialDecay(lr, 100000 steps,
  rate 0.1, staircase) schedule, with the discriminator at 5x lr (TTUR)
  (/root/reference/srgan.py:35-50).
* pix2pix: Adam(2e-4, beta1=0.5) for both nets (/root/reference/pix2pix.py:30-31).
Adam eps is 1e-7 (the Keras default) rather than optax's 1e-8.

The step counter lives **inside** the state so it survives checkpoint/resume
— fixing the reference quirk where `model.iterations` was a Python int that
reset on restart (/root/reference/srgan.py:26-27).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from denoise_gan_tpu.models import ModelBundle
from denoise_gan_tpu.utils.config import TrainConfig


class NetState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class GANTrainState(struct.PyTreeNode):
    gen: NetState
    disc: NetState
    step: jax.Array          # int32 scalar
    epoch: jax.Array         # int32 scalar


def ttur_schedules(cfg: TrainConfig, family: str) -> tuple[Callable, Callable]:
    if family == "pix2pix":
        gen = optax.constant_schedule(2e-4)
        disc = optax.constant_schedule(2e-4)
        return gen, disc
    gen = optax.exponential_decay(cfg.lr, transition_steps=100_000,
                                  decay_rate=0.1, staircase=True)
    disc = optax.exponential_decay(cfg.lr * 5.0, transition_steps=100_000,
                                   decay_rate=0.1, staircase=True)
    return gen, disc


def make_optimizers(cfg: TrainConfig, family: str
                    ) -> tuple[optax.GradientTransformation,
                               optax.GradientTransformation]:
    gen_sched, disc_sched = ttur_schedules(cfg, family)
    b1 = 0.5 if family == "pix2pix" else 0.9
    gen_tx = optax.adam(gen_sched, b1=b1, b2=0.999, eps=1e-7)
    disc_tx = optax.adam(disc_sched, b1=b1, b2=0.999, eps=1e-7)
    return gen_tx, disc_tx


def create_train_state(bundle: ModelBundle, cfg: TrainConfig,
                       rng: jax.Array) -> GANTrainState:
    """Initialize both nets at the configured crop geometry."""
    gen_rng, disc_rng = jax.random.split(rng)
    lr_size = cfg.crop_size // cfg.scale if bundle.upscales else cfg.crop_size
    lr_shape = (1, lr_size, lr_size, 3)
    hr_shape = (1, cfg.crop_size, cfg.crop_size, 3)

    gen_vars = bundle.generator.init(
        {"params": gen_rng, "dropout": gen_rng},
        jnp.zeros(lr_shape, jnp.float32), train=False)
    if bundle.conditional_disc:
        disc_vars = bundle.discriminator.init(
            disc_rng, jnp.zeros(hr_shape, jnp.float32),
            jnp.zeros(hr_shape, jnp.float32), train=False)
    else:
        disc_vars = bundle.discriminator.init(
            disc_rng, jnp.zeros(hr_shape, jnp.float32), train=False)

    gen_tx, disc_tx = make_optimizers(cfg, bundle.name)
    gen = NetState(params=gen_vars["params"],
                   batch_stats=gen_vars.get("batch_stats", {}),
                   opt_state=gen_tx.init(gen_vars["params"]))
    disc = NetState(params=disc_vars["params"],
                    batch_stats=disc_vars.get("batch_stats", {}),
                    opt_state=disc_tx.init(disc_vars["params"]))
    return GANTrainState(gen=gen, disc=disc,
                         step=jnp.zeros((), jnp.int32),
                         epoch=jnp.zeros((), jnp.int32))


def param_count(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def model_summary(name: str, params: Any, batch_stats: Any = None) -> str:
    """Keras model.summary()-style per-layer parameter table — the
    reference prints both nets' summaries before training
    (/root/reference/train_fsrgan.py:231-234)."""
    lines = [f'Model: "{name}"',
             "_" * 64,
             f"{'Layer (path)':<40}{'Param shapes':<14}{'Param #':>10}",
             "=" * 64]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_module: dict[str, list] = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        module = "/".join(keys[:-1]) or keys[0]
        by_module.setdefault(module, []).append((keys[-1], leaf))
    total = 0
    for module, leaves in by_module.items():
        n = sum(l.size for _, l in leaves)
        total += n
        shapes = ",".join("x".join(map(str, l.shape)) for _, l in leaves)
        lines.append(f"{module:<40}{shapes[:13]:<14}{n:>10,}")
    lines.append("=" * 64)
    stats = param_count(batch_stats) if batch_stats else 0
    lines.append(f"Total params: {total:,}"
                 + (f" (+ {stats:,} BatchNorm stats)" if stats else ""))
    lines.append("_" * 64)
    return "\n".join(lines)
