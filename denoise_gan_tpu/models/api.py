"""Reference-style ``Model(args)`` object API.

The reference's de-facto framework API is "args in, ``.generator /
.discriminator / .vgg / .gen_optimizer / .disc_optimizer / .content_loss``
out" (SURVEY.md §3.6; constructors at /root/reference/srgan.py:11-67,
/root/reference/fsrgan.py:8-70, /root/reference/autoencoder.py:7-61,
/root/reference/pix2pix.py:7-43).  These wrappers provide that object
surface on top of the functional Flax/optax building blocks so users of the
reference find the same attribute names; the training CLIs themselves use
the functional path (train/state.py, train/step.py) directly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from denoise_gan_tpu.losses.gan import content_loss as _content_loss
from denoise_gan_tpu.models import ModelBundle, build_models
from denoise_gan_tpu.models.vgg import init_vgg_params
from denoise_gan_tpu.train.state import make_optimizers
from denoise_gan_tpu.utils.config import TrainConfig


class _ModelAPI:
    """Shared wrapper: constructs the family bundle, both optax optimizers,
    the frozen VGG19 feature params, and initialized net variables."""

    family: str = ""

    def __init__(self, cfg: TrainConfig, seed: int = 0):
        self.cfg = cfg
        self.bundle: ModelBundle = build_models(
            self.family, scale=cfg.scale, fp16=cfg.fp16)
        self.generator = self.bundle.generator
        self.discriminator = self.bundle.discriminator
        self.vgg = init_vgg_params()
        self.gen_optimizer, self.disc_optimizer = make_optimizers(
            cfg, self.family)
        # step/epoch counters (reference: srgan.py:26-27; here they are a
        # convenience mirror — the authoritative counter lives in the
        # checkpointed GANTrainState, fixing the reference's reset-on-resume)
        self.iterations = 0
        self.epochs = 0
        self.hr_shape = [cfg.crop_size, cfg.crop_size, 3]
        lr = cfg.crop_size // cfg.scale if self.bundle.upscales \
            else cfg.crop_size
        self.lr_shape = [lr, lr, 3]

        rng = jax.random.key(seed)
        gen_rng, disc_rng, drop_rng = jax.random.split(rng, 3)
        x_lr = jnp.zeros((1, *self.lr_shape), jnp.float32)
        x_hr = jnp.zeros((1, *self.hr_shape), jnp.float32)
        self.gen_variables = self.generator.init(
            {"params": gen_rng, "dropout": drop_rng}, x_lr, train=False)
        if self.bundle.conditional_disc:
            self.disc_variables = self.discriminator.init(
                disc_rng, x_hr, x_hr, train=False)
        else:
            self.disc_variables = self.discriminator.init(
                disc_rng, x_hr, train=False)

    # --- reference loss surface -------------------------------------
    def content_loss(self, target: jax.Array, output: jax.Array) -> jax.Array:
        """VGG19 block5_conv4 feature MSE (/root/reference/srgan.py:69-75)."""
        return _content_loss(self.vgg, target, output)

    # --- forward helpers ---------------------------------------------
    def generate(self, x: jax.Array, train: bool = False) -> jax.Array:
        if train:
            # BatchNorm families need mutable batch_stats under train=True;
            # this convenience forward discards the updates (ADVICE.md r2)
            out, _ = self.generator.apply(
                self.gen_variables, x, train=True,
                rngs={"dropout": jax.random.key(0)},
                mutable=["batch_stats"])
            return out
        return self.generator.apply(self.gen_variables, x, train=False)

    def discriminate(self, x: jax.Array, y: Any = None,
                     train: bool = False) -> jax.Array:
        args = (x, y) if self.bundle.conditional_disc else (x,)
        if train:
            out, _ = self.discriminator.apply(
                self.disc_variables, *args, train=True,
                mutable=["batch_stats"])
            return out
        return self.discriminator.apply(self.disc_variables, *args,
                                        train=False)


class Autoencoder(_ModelAPI):
    """/root/reference/autoencoder.py:4-61 object surface."""
    family = "autoencoder"


class Pix2Pix(_ModelAPI):
    """/root/reference/pix2pix.py:4-43 object surface (conditional D)."""
    family = "pix2pix"


class SRGAN(_ModelAPI):
    """/root/reference/srgan.py:8-67 object surface."""
    family = "srgan"


class FastSRGAN(_ModelAPI):
    """/root/reference/fsrgan.py:5-70 object surface."""
    family = "fsrgan"
