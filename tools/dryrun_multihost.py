#!/usr/bin/env python
"""2-process multi-host dryrun over DCN-style jax.distributed (VERDICT r2 #5).

Proves the multi-host path SURVEY.md §5 names — `jax.distributed.initialize`
via :func:`denoise_gan_tpu.parallel.mesh.init_distributed`, per-host input
pipeline sharding (data/pipeline.py process_index/process_count), and one
GLOBAL data-parallel GAN train step over a mesh spanning both processes —
without a cluster: coordinator on localhost, 2 processes x 4 virtual CPU
devices (xla_force_host_platform_device_count).

Launcher mode (default) spawns the two children and asserts: both exit 0,
losses finite, and the post-step parameter checksum is IDENTICAL across
processes (the GSPMD grad all-reduce really synchronized them).

Usage:  python tools/dryrun_multihost.py            # launcher
        (children are spawned with --proc N automatically)
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(proc_id: int, nprocs: int, port: int,
          train_mode: bool = False) -> None:
    # CPU platform + 4 virtual devices per process (the env is prepared by
    # the launcher; JAX_PLATFORMS/axon must be absent before jax imports)
    import jax
    jax.config.update("jax_platforms", "cpu")

    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nprocs)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)

    import numpy as np
    import jax.numpy as jnp
    from denoise_gan_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed()
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == proc_id
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"[proc {proc_id}] {n_local} local / {n_global} global devices",
          flush=True)
    assert n_global == nprocs * n_local

    # per-host sharded input pipeline over a tiny synthetic corpus
    from denoise_gan_tpu.data.pipeline import DataPipeline
    from denoise_gan_tpu.utils.config import make_config
    data_dir = os.path.join("/tmp/dryrun_mh", "data", "cls")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    # 9 files / 2 procs = UNEQUAL shards (5 vs 4): exercises the all-host
    # minimum step-count truncation — without it the host with 5 files
    # would run an extra collective step and deadlock (ADVICE r3).
    for i in range(9):
        p = os.path.join(data_dir, f"im{i}.npy")
        if not os.path.exists(p):
            np.save(p, rng.random((48, 48, 3)).astype(np.float32))

    cfg = make_config("fsrgan", image_dir=os.path.dirname(data_dir))
    cfg.crop_size = 32
    cfg.batch_size = 4           # PER-HOST batch; global = 4 * nprocs
    cfg.scale = 4
    cfg.finalize()
    global_bs = cfg.batch_size * nprocs
    pipe = DataPipeline(cfg, seed=123, process_index=proc_id,
                        process_count=nprocs)
    # all-host min shard: 9 // 2 = 4 on BOTH hosts (proc 0 holds 5 files)
    assert pipe.train_size == 4, pipe.train_size
    assert len(pipe.paths) == (5 if proc_id == 0 else 4), len(pipe.paths)

    if train_mode:
        # the REAL trainer under multi-host: per-host pipeline shard,
        # global DP step, multihost Orbax checkpointing, process-0-only
        # TB/exports (train/loop.py)
        os.makedirs("/tmp/dryrun_mh_train", exist_ok=True)
        os.chdir("/tmp/dryrun_mh_train")
        from denoise_gan_tpu.train.loop import train
        cfg.epochs = 2
        cfg.retrain = 0
        cfg.ckpt = 1
        cfg.save_model = 1
        cfg.log_images = 0
        cfg.model_name = "mh_fsrgan"
        state = train(cfg, "fsrgan")
        leaves = jax.tree.leaves(state.gen.params) + \
            jax.tree.leaves(state.disc.params)
        checksum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                             for x in leaves))
        ok_export = (proc_id != 0) or os.path.exists(
            "models/mh_fsrgan.dgt")
        print(f"[proc {proc_id}] RESULT gen_loss=0 disc_loss=0 "
              f"checksum={checksum:.6f} export_ok={ok_export}", flush=True)
        assert ok_export
        jax.distributed.shutdown()
        return

    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.vgg import init_vgg_params
    from denoise_gan_tpu.train.state import create_train_state
    from denoise_gan_tpu.train.step import build_train_step, jit_train_step

    mesh = make_mesh()           # 1-D data axis over all 8 global devices
    bundle = build_models("fsrgan", scale=cfg.scale)
    state = create_train_state(bundle, cfg, jax.random.key(cfg.seed))
    vgg_params = init_vgg_params()

    repl = jax.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), repl, lambda idx, x=x: np.asarray(x)[idx]),
        state)
    vgg_params = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), repl, lambda idx, x=x: np.asarray(x)[idx]),
        vgg_params)

    step_fn = jit_train_step(build_train_step(bundle, cfg), mesh)
    bs = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    step_rng = jax.random.key(7)

    local = next(iter(pipe.epoch()))          # (4, 32, 32, 3) per host
    hr = jax.make_array_from_process_local_data(
        bs, local, (global_bs, *local.shape[1:]))
    for it in range(2):
        state, metrics = step_fn(state, vgg_params, hr, step_rng)
    gl = float(metrics["gen_loss"])
    dl = float(metrics["disc_loss"])
    assert np.isfinite(gl) and np.isfinite(dl), (gl, dl)

    leaves = jax.tree.leaves(state.gen.params) + \
        jax.tree.leaves(state.disc.params)
    checksum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                         for x in leaves))
    print(f"[proc {proc_id}] RESULT gen_loss={gl:.6f} disc_loss={dl:.6f} "
          f"checksum={checksum:.6f}", flush=True)
    jax.distributed.shutdown()


def launcher(nprocs: int, port: int, train_mode: bool = False) -> int:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # strip the axon plugin from PYTHONPATH so the CPU backend wins
    pp = [p for p in env.get("PYTHONPATH", "").split(":")
          if p and "axon" not in p]
    env["PYTHONPATH"] = ":".join([REPO] + pp)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4").strip()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--proc", str(i),
         "--nprocs", str(nprocs), "--port", str(port)]
        + (["--train", "1"] if train_mode else []),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(nprocs)]
    outs = [p.communicate()[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    results = []
    for i, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-12:])
        print(f"--- proc {i} (rc={procs[i].returncode}) ---\n{tail}",
              flush=True)
        m = re.search(r"RESULT gen_loss=(\S+) disc_loss=(\S+) "
                      r"checksum=(\S+)", out)
        results.append(m.groups() if m else None)
    if not ok or any(r is None for r in results):
        print("DRYRUN MULTIHOST: FAILED", flush=True)
        return 1
    if len({r[2] for r in results}) != 1:
        print(f"DRYRUN MULTIHOST: checksum mismatch {results}", flush=True)
        return 1
    print(f"DRYRUN MULTIHOST ok: {nprocs} procs x 4 devices, "
          f"gen_loss={results[0][0]}, disc_loss={results[0][1]}, "
          f"param checksum identical across processes", flush=True)
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--proc", type=int, default=-1)
    p.add_argument("--nprocs", type=int, default=2)
    p.add_argument("--port", type=int, default=29511)
    p.add_argument("--train", type=int, default=0,
                   help="run the REAL train() loop under 2 processes "
                        "instead of the bare-step dryrun")
    args = p.parse_args()
    if args.proc >= 0:
        child(args.proc, args.nprocs, args.port, bool(args.train))
    else:
        sys.exit(launcher(args.nprocs, args.port, bool(args.train)))


if __name__ == "__main__":
    main()
