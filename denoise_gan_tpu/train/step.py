"""The jitted joint G+D GAN training step.

One compiled XLA program per family contains: on-device degradation
(bicubic + JPEG artifacts + normalize), the generator forward, both
discriminator forwards, all loss terms (incl. VGG content features), both
backward passes, and both optimizer updates — the TPU-native equivalent of
the reference's @tf.function train_step plus its host-side tf.data maps
(/root/reference/train_srgan.py:61-118, /root/reference/dataloader.py:200-221).

Both optimizers update from the same forward every step (joint update, no
alternation), exactly like the reference.  Under a device mesh the batch is
sharded on the 'data' axis and params are replicated; GSPMD inserts the grad
all-reduces and computes BatchNorm statistics over the global batch.

Gradient structure: two grad computations over disjoint parameter trees —
the generator's loss differentiates through D(fake) w.r.t. G's params only
(D's params are constants there), and the discriminator's loss sees
stop_gradient(fake) by construction since we differentiate w.r.t. D's params.
BatchNorm running stats are taken from one real + one fake D forward,
matching the TF tape semantics.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from denoise_gan_tpu.data.degrade import degrade_pair
from denoise_gan_tpu.losses.gan import (
    adversarial_loss, bce_logits, bce_probs, content_loss,
    discriminator_loss, l1_loss, l2_loss, tv_loss,
)
from denoise_gan_tpu.models import ModelBundle
from denoise_gan_tpu.ops.image import renorm
from denoise_gan_tpu.ops.metrics import psnr, ssim
from denoise_gan_tpu.train.state import GANTrainState, NetState, make_optimizers
from denoise_gan_tpu.utils.config import TrainConfig
from denoise_gan_tpu.parallel.mesh import DATA_AXIS


def build_train_step(bundle: ModelBundle, cfg: TrainConfig,
                     degrade: bool = True) -> Callable:
    """Returns step(state, vgg_params, hr01, rng) -> (state, metrics).

    degrade=False feeds PRE-degraded pairs: ``hr01`` is then an
    ``(img_in, img_tgt)`` tuple already normalized to [-1, 1] (used by
    tools/h2h_lockstep.py to drive both frameworks with identical batches;
    also lets users train on externally-prepared pairs)."""

    gen_tx, disc_tx = make_optimizers(cfg, bundle.name)
    from_logits = not bundle.disc_sigmoid
    family = bundle.name

    def apply_disc(disc_params, disc_stats, cond, img):
        variables = {"params": disc_params, "batch_stats": disc_stats}
        if bundle.conditional_disc:
            out, mut = bundle.discriminator.apply(
                variables, cond, img, train=True, mutable=["batch_stats"])
        else:
            out, mut = bundle.discriminator.apply(
                variables, img, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def step(state: GANTrainState, vgg_params: Any, hr01: jax.Array,
             rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        quality_rng, dropout_rng, identity_rng = jax.random.split(rng, 3)
        if degrade:
            # --jpeg_quality 0 selects per-image random quality 25..75 on
            # device (the reference's dormant random_jpeg_quality,
            # /root/reference/dataloader.py:142-159)
            img_in, img_tgt = degrade_pair(
                hr01, cfg.scale, max(cfg.jpeg_quality, 1), rng=quality_rng,
                random_quality=cfg.jpeg_quality <= 0)
        else:
            img_in, img_tgt = hr01

        # ---------------- generator loss & grads ----------------
        def gen_loss_fn(gen_params):
            gen_out, gen_mut = bundle.generator.apply(
                {"params": gen_params, "batch_stats": state.gen.batch_stats},
                img_in, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            disc_fake, _ = apply_disc(state.disc.params,
                                      state.disc.batch_stats, img_in, gen_out)

            cont = content_loss(vgg_params, img_tgt, gen_out)
            adv = 1e-3 * adversarial_loss(disc_fake, from_logits)
            mse = l2_loss(img_tgt, gen_out)
            mae = l1_loss(img_tgt, gen_out)
            var = 1e-5 * tv_loss(img_tgt, gen_out)

            if family == "pix2pix":
                # identity loss runs a second G forward on the target
                # (/root/reference/pix2pix.py:90); stats mutation discarded.
                ident_out, _ = bundle.generator.apply(
                    {"params": gen_params,
                     "batch_stats": state.gen.batch_stats},
                    img_tgt, train=True, mutable=["batch_stats"],
                    rngs={"dropout": identity_rng})
                identity = l1_loss(img_tgt, ident_out)
                total = adv + var + mae + mse + cont + identity
            else:
                # autoencoder/srgan/fsrgan trainers: content + adv + mae
                # (+0*mse, +0*var) (/root/reference/train_srgan.py:91)
                identity = jnp.float32(0.0)
                total = cont + adv + mae

            aux = dict(gen_output=gen_out,
                       gen_batch_stats=gen_mut["batch_stats"],
                       adv_loss=adv, content_loss=cont, mse_loss=mse,
                       mae_loss=mae, var_loss=var, identity_loss=identity)
            return total, aux

        (gen_total, aux), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen.params)
        gen_out = aux.pop("gen_output")
        new_gen_stats = aux.pop("gen_batch_stats")

        # ---------------- discriminator loss & grads ----------------
        fake = jax.lax.stop_gradient(gen_out)

        def disc_loss_fn(disc_params):
            disc_real, stats1 = apply_disc(disc_params,
                                           state.disc.batch_stats,
                                           img_in, img_tgt)
            disc_fake, stats2 = apply_disc(disc_params, stats1, img_in, fake)
            loss = discriminator_loss(disc_real, disc_fake, from_logits,
                                      half=(family == "fsrgan"))
            return loss, stats2

        (disc_total, new_disc_stats), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc.params)

        # ---------------- optimizer updates ----------------
        gen_updates, new_gen_opt = gen_tx.update(
            gen_grads, state.gen.opt_state, state.gen.params)
        new_gen_params = jax.tree.map(lambda p, u: p + u,
                                      state.gen.params, gen_updates)
        disc_updates, new_disc_opt = disc_tx.update(
            disc_grads, state.disc.opt_state, state.disc.params)
        new_disc_params = jax.tree.map(lambda p, u: p + u,
                                       state.disc.params, disc_updates)

        new_state = GANTrainState(
            gen=NetState(new_gen_params, new_gen_stats, new_gen_opt),
            disc=NetState(new_disc_params, new_disc_stats, new_disc_opt),
            step=state.step + 1,
            epoch=state.epoch,
        )

        out01, tgt01 = renorm(gen_out), renorm(img_tgt)
        # PSNR is ~free; SSIM (11x11 windowed convs) costs ~35% of the whole
        # step (profiled), so it is computed in the save_iter summary fn
        # (train/loop.py) instead of every step.
        metrics = dict(
            gen_loss=gen_total, disc_loss=disc_total,
            psnr=jnp.mean(psnr(out01, tgt01)),
            **aux,
        )
        return new_state, metrics

    return step


def jit_train_step(step: Callable, mesh: Mesh | None = None) -> Callable:
    """jit with donation of the train state; under a mesh, the HR batch is
    sharded on the 'data' axis and everything else replicated."""
    if mesh is None:
        return jax.jit(step, donate_argnums=0)
    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        donate_argnums=0,
        in_shardings=(repl, repl, batch_shard, repl),
        out_shardings=(repl, repl),
    )


def make_eval_fn(bundle: ModelBundle) -> Callable:
    """Jitted generator-only forward for summaries/inference previews
    (train=False: BN running stats, no dropout)."""

    @functools.partial(jax.jit, static_argnames=())
    def forward(gen_params, gen_stats, x):
        return bundle.generator.apply(
            {"params": gen_params, "batch_stats": gen_stats}, x, train=False)

    return forward
