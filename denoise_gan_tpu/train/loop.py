"""Training loop + trainer entry point shared by all four families.

The shell around the jitted step, rebuilding the reference trainers' mains
(/root/reference/train_srgan.py:180-259): directory layout, steps/epoch and
save_iter clamping, checkpoint restore-if-retrain, the epoch loop with
per-epoch wall-clock prints, every-5-epoch checkpoints, TensorBoard scalar +
image summaries every `save_iter` steps, and final params-only exports (the
`.h5` analog).  Adds: steps/sec + on-device PSNR/SSIM instrumentation
(BASELINE.md requires them; the reference measured nothing).
"""

from __future__ import annotations

import os
import signal
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.data.degrade import degrade_pair
from denoise_gan_tpu.data.pipeline import DataPipeline
from denoise_gan_tpu.io.checkpoint import (
    CheckpointManager, export_generator, export_net, load_export_into,
)
from denoise_gan_tpu.models import ModelBundle, build_models
from denoise_gan_tpu.models.vgg import init_vgg_params
from denoise_gan_tpu.ops.image import (
    high_pass_x_y, sobel_variation, to_uint8, total_variation_map,
)
from denoise_gan_tpu.parallel.mesh import init_distributed, make_mesh, shard_batch
from denoise_gan_tpu.train.state import (
    GANTrainState, create_train_state, model_summary, param_count,
)
from denoise_gan_tpu.train.step import build_train_step, jit_train_step
from denoise_gan_tpu.utils.config import TrainConfig, get_path
from denoise_gan_tpu.utils.logging import SummaryWriter, timestamped_run_dir
from denoise_gan_tpu.utils.profiling import StepTimer, check_finite, trace

SCALAR_KEYS = ("gen_loss", "adv_loss", "content_loss", "mse_loss", "mae_loss",
               "var_loss", "identity_loss", "disc_loss", "psnr", "ssim")


def build_summary_fn(bundle: ModelBundle, cfg: TrainConfig):
    """One jitted program computing every TensorBoard image panel on device
    (first sample of the batch), returning uint8 HWC arrays
    (/root/reference/train_srgan.py:152-174)."""

    from denoise_gan_tpu.ops.image import renorm
    from denoise_gan_tpu.ops.metrics import ssim

    @jax.jit
    def summaries(gen_params, gen_stats, hr01):
        # Mirror the train step's degradation: --jpeg_quality 0 means random
        # quality 25..75, so panels use a representative draw from that
        # distribution rather than the clipped-to-1 worst case (ADVICE.md).
        img_in, img_tgt = degrade_pair(
            hr01[:1], cfg.scale, max(cfg.jpeg_quality, 1),
            rng=jax.random.key(cfg.seed), random_quality=cfg.jpeg_quality <= 0)
        img_gen = bundle.generator.apply(
            {"params": gen_params, "batch_stats": gen_stats},
            img_in, train=False)
        # SSIM lives here (every save_iter) rather than in the hot step —
        # its 11x11 windowed convs cost ~35% of a train step (PERF.md)
        ssim_val = jnp.mean(ssim(renorm(img_gen), renorm(img_tgt)))
        err = img_gen - img_tgt
        dx_gen, dy_gen = high_pass_x_y(img_gen)
        dx_tgt, dy_tgt = high_pass_x_y(img_tgt)
        panels = {
            "Images/Input": to_uint8(img_in),
            "Images/Target": to_uint8(img_tgt),
            "Images/Generated": to_uint8(img_gen),
            "Error/Square Error (MSE)": to_uint8(jnp.square(err), norm=False),
            "Error/Absolute Error (MAE)": to_uint8(jnp.abs(err), norm=False),
            "Error/Sobel Variation": to_uint8(sobel_variation(err), norm=False),
            "Error/Total Variation": to_uint8(total_variation_map(err), norm=False),
            "Image Gradients/Sobel Input": to_uint8(sobel_variation(img_in), norm=False),
            "Image Gradients/Sobel Target": to_uint8(sobel_variation(img_tgt), norm=False),
            "Image Gradients/Sobel Generated": to_uint8(sobel_variation(img_gen), norm=False),
            "Image Gradients/dx Target": to_uint8(dx_tgt, norm=False),
            "Image Gradients/dy Target": to_uint8(dy_tgt, norm=False),
            "Image Gradients/dx Generated": to_uint8(dx_gen, norm=False),
            "Image Gradients/dy Generated": to_uint8(dy_gen, norm=False),
            "Image Gradients/Total Var Target": to_uint8(total_variation_map(img_tgt), norm=False),
            "Image Gradients/Total Var Generated": to_uint8(total_variation_map(img_gen), norm=False),
        }
        return {k: v[0] for k, v in panels.items()}, ssim_val

    return summaries


def warm_start_from_exports(state: GANTrainState,
                            model_name: str) -> GANTrainState:
    """Load generator/discriminator weights from prior `.dgt` exports when no
    training checkpoint exists — the reference's --retrain reload of the final
    `.h5` saves (/root/reference/autoencoder.py:141-146, 206-213).  Optimizer
    state and step counters start fresh, as in the reference."""
    gen_path = get_path("models", f"{model_name}.dgt")
    disc_path = get_path("models", f"{model_name}_disc.dgt")
    if os.path.exists(gen_path):
        print("Warm-starting generator from export:", gen_path)
        _, p, s = load_export_into(gen_path, state.gen.params,
                                   state.gen.batch_stats)
        state = state.replace(gen=state.gen.replace(params=p, batch_stats=s))
    if os.path.exists(disc_path):
        print("Warm-starting discriminator from export:", disc_path)
        _, p, s = load_export_into(disc_path, state.disc.params,
                                   state.disc.batch_stats)
        state = state.replace(disc=state.disc.replace(params=p, batch_stats=s))
    return state


class _NullWriter:
    """No-op SummaryWriter stand-in for non-primary hosts."""

    def scalar(self, *a, **k):
        pass

    def scalars(self, *a, **k):
        pass

    def image(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def train(cfg: TrainConfig, family: str) -> GANTrainState:
    """Full training run; returns the final state.

    Multi-host: launch one process per host with JAX_COORDINATOR_ADDRESS
    (+ JAX_NUM_PROCESSES/JAX_PROCESS_ID where not auto-detected).
    cfg.batch_size is the PER-HOST batch; the jitted step runs on the
    global batch (batch_size x process_count) over a mesh spanning every
    process, with the input pipeline file-sharded per host
    (tools/dryrun_multihost.py --train exercises this end to end)."""
    init_distributed()
    nproc = jax.process_count()
    mesh = make_mesh(cfg.num_devices)
    n_dev = mesh.devices.size
    global_bs = cfg.batch_size * nproc
    if global_bs % max(n_dev, 1):
        if nproc > 1:
            # Multi-host MUST run the mesh-sharded global step — falling back
            # to unsharded per-process jit would silently train process_count
            # independent, never-synchronized replicas (ADVICE r3).
            raise ValueError(
                f"multi-host training requires the global batch "
                f"({cfg.batch_size} per host x {nproc} hosts = {global_bs}) "
                f"to be divisible by the {n_dev} devices; adjust --batch_size")
        if cfg.batch_size > 1:
            raise ValueError(
                f"global batch {global_bs} not divisible by {n_dev} devices")
    use_mesh = n_dev > 1 and global_bs % n_dev == 0

    # Directory layout (/root/reference/train_srgan.py:188-195)
    ckpt_dir = get_path("models/checkpoints", cfg.model_name)
    backup_dir = get_path("models/backups", cfg.model_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(backup_dir, exist_ok=True)
    os.makedirs(cfg.logdir, exist_ok=True)

    pipeline = DataPipeline(cfg, process_index=jax.process_index(),
                            process_count=jax.process_count())
    steps_per_epoch = len(pipeline)
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset too small: {pipeline.train_size} image(s) per host "
            f"under {cfg.image_dir} yields 0 steps at --batch_size "
            f"{cfg.batch_size} (drop_remainder semantics); add images or "
            f"lower --batch_size")
    print(f"Steps per epoch: {steps_per_epoch}")
    if cfg.save_iter > steps_per_epoch:
        cfg.save_iter = max(steps_per_epoch, 1)
        print(f"Modified save_iter: {cfg.save_iter}")

    if jax.process_index() == 0:
        run_dir = timestamped_run_dir(cfg.logdir, cfg.model_name)
        writer = SummaryWriter(run_dir)
        print("Created Tensorboard Summary here:", run_dir)
    else:      # non-primary hosts: no TB dir/files, same control flow
        writer = _NullWriter()

    bundle = build_models(family, scale=cfg.scale, fp16=bool(cfg.fp16))
    state = create_train_state(bundle, cfg, jax.random.key(cfg.seed))
    # per-layer summaries for both nets (/root/reference/train_fsrgan.py:231-234)
    print(model_summary(f"{family}_generator", state.gen.params,
                        state.gen.batch_stats))
    print(model_summary(f"{family}_discriminator", state.disc.params,
                        state.disc.batch_stats))
    print(f"Generator params: {param_count(state.gen.params):,}  "
          f"Discriminator params: {param_count(state.disc.params):,}  "
          f"devices: {n_dev}")
    vgg_params = init_vgg_params()

    manager = CheckpointManager(ckpt_dir, max_to_keep=cfg.max_to_keep)
    # try/finally so pending ASYNC Orbax saves are awaited and
    # their errors surfaced on every exit path, and the summary
    # writer is flushed even when the epoch loop raises (ADVICE r2)
    try:
        if cfg.retrain and manager.latest_step() is not None:
            print("Restoring checkpoint from here:", ckpt_dir)
            state = manager.restore(state)
        elif cfg.retrain:
            # Warm start from a prior run's exports when no Orbax checkpoint
            # exists — the reference reloads models/{name}.h5 (+ the
            # discriminator .h5) on --retrain (/root/reference/autoencoder.py:141-146,
            # 206-213).  Step/opt state start fresh, like the reference.
            state = warm_start_from_exports(state, cfg.model_name)

        step_fn = jit_train_step(build_train_step(bundle, cfg),
                                 mesh if use_mesh else None)
        summary_fn = build_summary_fn(bundle, cfg)
        rng = jax.random.key(cfg.seed + 1)
        # imgs/s counts the GLOBAL batch the step consumes, not just this
        # host's shard (ADVICE r3).
        timer = StepTimer(cfg.batch_size * nproc)

        # Preemption handling: checkpoint at the next log point on SIGTERM
        # (elastic-recovery hook the reference lacks, SURVEY.md §5).
        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass  # not on the main thread (e.g. under some test runners)

        metrics = {}
        # Host-side step counter: pulling int(state.step) every step would sync
        # the device and cap the dispatch queue at depth 1 (VERDICT r1); the
        # device counter is only read at checkpoint/epoch boundaries.
        it = int(state.step)
        epoch0 = int(state.epoch)
        for epoch in range(cfg.epochs):
            state = state.replace(epoch=state.epoch + 1)
            print(f"|== Starting epoch: {epoch0 + epoch + 1}, ", end="", flush=True)
            train_begin = time.time()
            last_batch = None
            profile_this_epoch = bool(cfg.profile_dir) and epoch == min(
                1, cfg.epochs - 1)  # profile a post-compile epoch
            with trace(cfg.profile_dir if profile_this_epoch else None):
                for hr in pipeline.epoch():
                    hr = jnp.asarray(hr)
                    if use_mesh:
                        hr = shard_batch(hr, mesh)
                    last_batch = hr
                    state, metrics = step_fn(state, vgg_params, hr, rng)
                    timer.tick()
                    it += 1
                    if preempted["flag"]:
                        print(f"\nSIGTERM: checkpointing at step {it} and exiting")
                        manager.save(it, state)
                        return state
                    if it % cfg.save_iter != 0:
                        continue
                    host_metrics = {k: float(metrics[k]) for k in SCALAR_KEYS
                                    if k in metrics}
                    if cfg.check_numerics:
                        check_finite(host_metrics, it)
                    writer.scalars(
                        {f"Generator Losses/{k}": v
                         for k, v in host_metrics.items()
                         if k not in ("disc_loss", "psnr", "ssim")}, it)
                    writer.scalar("Discriminator Losses/disc_loss",
                                  host_metrics["disc_loss"], it)
                    writer.scalar("Quality/psnr", host_metrics["psnr"], it)
                    if last_batch is not None:
                        panels, ssim_val = summary_fn(
                            state.gen.params, state.gen.batch_stats, last_batch)
                        writer.scalar("Quality/ssim", float(ssim_val), it)
                        if cfg.log_images:
                            for tag, img in panels.items():
                                writer.image(tag, np.asarray(img), it)
                    writer.flush()
            jax.block_until_ready(metrics)
            train_time = time.time() - train_begin

            if cfg.ckpt and epoch % cfg.ckpt_every_epochs == 0:
                manager.save(it, state)
            total_time = time.time() - train_begin
            sps = steps_per_epoch / max(train_time, 1e-9)
            print(
                f"disc_loss: {float(metrics['disc_loss']):.2e}, "
                f"adv_loss: {float(metrics['adv_loss']):.2e}, "
                f"vgg: {float(metrics['content_loss']):.2e}, "
                f"mse: {float(metrics['mse_loss']):.2e}, "
                f"mae: {float(metrics['mae_loss']):.2e}, "
                f"psnr: {float(metrics['psnr']):.2f}, "
                f"iters: {it}, train: {train_time:0.2f}, "
                f"total: {total_time:0.2f}, steps/s: {sps:0.2f}, "
                # compile-excluded run rate (StepTimer, cumulative across
                # epochs) alongside the per-epoch wall-clock rate
                f"run steps/s: {timer.steps_per_sec:0.2f}, "
                f"imgs/s: {timer.images_per_sec:0.1f} ==|")

        # Final checkpoint so resume continues from the last step (the reference
        # only checkpointed every 5 epochs and lost the trailing epochs; pix2pix
        # alone saved at exit, /root/reference/train_pix2pix.py:193)
        if cfg.ckpt:
            manager.save(it, state)

        # Final exports (the reference's final .h5 saves,
        # /root/reference/train_srgan.py:256-259)
        if cfg.save_model and jax.process_index() == 0:
            short = time.strftime("%m%d_%H%M")
            export_generator(get_path("models", f"{cfg.model_name}.dgt"),
                             family, cfg.scale, state.gen.params,
                             state.gen.batch_stats)
            export_generator(os.path.join(backup_dir,
                                          f"{cfg.model_name}_{short}.dgt"),
                             family, cfg.scale, state.gen.params,
                             state.gen.batch_stats)
            # Discriminator export enables --retrain warm starts (the reference
            # also saved discriminator .h5s, /root/reference/train_srgan.py:256-259).
            export_net(get_path("models", f"{cfg.model_name}_disc.dgt"),
                       family, cfg.scale, state.disc.params,
                       state.disc.batch_stats, role="discriminator")
    finally:
        writer.close()
        manager.close()
    return state


def main(family: str, argv: list[str] | None = None) -> GANTrainState:
    from denoise_gan_tpu.utils.config import parse_args

    cfg = parse_args(family, argv)
    print("COMPUTATION PARAMETERS")
    print("Compute dtype: %s" % ("bfloat16" if cfg.fp16 else "float32"))
    print("Variable dtype: float32")
    cfg.echo()
    return train(cfg, family)
