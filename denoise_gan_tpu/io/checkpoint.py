"""Two-tier checkpointing, mirroring the reference's split (SURVEY.md §5):

Tier 1 — training checkpoints: the full GANTrainState (both nets' params,
BatchNorm stats, optimizer states, step/epoch counters) via Orbax, with
``max_to_keep=3`` and an every-5-epochs cadence like the reference's
tf.train.CheckpointManager (/root/reference/train_srgan.py:219-227, 244-245).
Unlike the reference, the step counter is checkpointed so resume is exact.

Tier 2 — exports: a params-only msgpack artifact (+ model config header) that
the inference CLIs consume — the analog of the reference's final Keras `.h5`
saves (/root/reference/train_srgan.py:256-259).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

from denoise_gan_tpu.train.state import GANTrainState


class CheckpointManager:
    """Thin wrapper over Orbax CheckpointManager for the GAN state."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: GANTrainState) -> None:
        """ASYNC save (SURVEY.md §5): Orbax serializes in a background
        thread so the periodic mid-training saves overlap the next steps.
        Durability points (restore/close — incl. the SIGTERM
        checkpoint-and-exit path, which closes the manager) wait."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state: GANTrainState) -> GANTrainState:
        """Restore the newest checkpoint into the structure of `state`
        (returns `state` unchanged if none exists — the reference's
        restore-if-retrain guard, /root/reference/train_srgan.py:225-227)."""
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            return state
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


# ---------------------------------------------------------------------------
# Tier 2: params-only export (the `.h5` analog), consumed by infer CLIs.

EXPORT_MAGIC = b"DGTPU1\n"


def export_net(path: str, family: str, scale: int,
               params: Any, batch_stats: Any,
               role: str = "generator") -> None:
    """Write {config, params, batch_stats} as magic + JSON header + msgpack."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = serialization.to_bytes(
        {"params": jax.tree.map(np.asarray, params),
         "batch_stats": jax.tree.map(np.asarray, batch_stats)})
    header = json.dumps({"family": family, "scale": scale,
                         "format": 1, "role": role}).encode()
    with open(path, "wb") as f:
        f.write(EXPORT_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(payload)


def export_generator(path: str, family: str, scale: int,
                     gen_params: Any, gen_batch_stats: Any) -> None:
    export_net(path, family, scale, gen_params, gen_batch_stats, "generator")


def read_export(path: str) -> tuple[dict, bytes]:
    """Returns (config_dict, raw msgpack payload)."""
    with open(path, "rb") as f:
        magic = f.read(len(EXPORT_MAGIC))
        if magic != EXPORT_MAGIC:
            raise ValueError(f"{path} is not a denoise_gan_tpu export")
        hlen = int.from_bytes(f.read(8), "little")
        config = json.loads(f.read(hlen))
        payload = f.read()
    return config, payload


def load_export_into(path: str, params_template: Any,
                     stats_template: Any) -> tuple[dict, Any, Any]:
    """Deserialize an export against caller-supplied pytree templates —
    used for warm-starting training from exports (the reference's
    --retrain .h5 reload, /root/reference/autoencoder.py:141-146)."""
    config, payload = read_export(path)
    template = {"params": params_template, "batch_stats": stats_template}
    restored = serialization.from_bytes(template, payload)
    return config, restored["params"], restored["batch_stats"]


def load_generator(path: str) -> tuple[dict, Any, Any]:
    """Returns (config_dict, params, batch_stats); rebuild the module with
    models.build_models(config['family'], config['scale']).

    Accepts BOTH artifact formats: `.dgt` exports and the reference's Keras
    `.h5` saves (sniffed by HDF5 magic and converted on the fly,
    io/keras_h5.py) — `infer.py --model fsrgan.h5` works as in the
    reference (/root/reference/infer.py:40-43)."""
    from denoise_gan_tpu.models import build_models  # local: avoid cycle

    from denoise_gan_tpu.io.keras_h5 import is_hdf5, load_h5_generator
    if is_hdf5(path):
        return load_h5_generator(path)

    config, payload = read_export(path)
    if config.get("role", "generator") != "generator":
        raise ValueError(f"{path} is a {config['role']} export, "
                         "not a generator")
    bundle = build_models(config["family"], scale=config["scale"])
    import jax.numpy as jnp
    size = 64 if bundle.upscales else 256
    lr = size // (config["scale"] if bundle.upscales else 1)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, lr, lr, 3), jnp.float32), train=False)
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    restored = serialization.from_bytes(template, payload)
    return config, restored["params"], restored["batch_stats"]
