"""Config system: typed dataclasses + the reference's params-dict argparse adapter.

The reference drives every entry point from a ``params = dict(...)`` of typed
defaults, emitting one ``parser.add_argument("--"+key, default=v, type=type(v))``
per entry, then applies post-parse coercions (int->bool, path expansion) and
suffixes the model name with ``_{scale}x_{jpeg_quality}q[_fp16]``
(reference: /root/reference/train_srgan.py:262-318).  We preserve the exact
flag names, defaults, and semantics per trainer while backing them with a
dataclass.

Known reference bugs intentionally fixed (but kept CLI-compatible):
* train_pix2pix lacked ``scale``/``jpeg_quality``/``model_name`` flags although
  DataLoader reads them (/root/reference/train_pix2pix.py:198-211 vs
  /root/reference/dataloader.py:24-25) — here they exist with safe defaults.
* ``--fp16`` maps to **bfloat16** compute on TPU (no loss scaling needed); the
  flag name is retained for CLI parity.
"""

from __future__ import annotations

import dataclasses
import os
from argparse import ArgumentParser
from dataclasses import dataclass, field
from typing import Any


def get_path(*parts: str) -> str:
    """expanduser+expandvars+realpath, as the reference's get_path
    (/root/reference/train_srgan.py:27-28)."""
    return os.path.realpath(
        os.path.expanduser(os.path.expandvars(os.path.join(*parts)))
    )


@dataclass
class TrainConfig:
    """Canonical flag set shared by all four trainers
    (reference: /root/reference/train_srgan.py:262-278)."""

    model_name: str = "srgan"
    image_dir: str = "train/image_input"
    model_dir: str = "./models"
    logdir: str = "./logs"
    batch_size: int = 1
    epochs: int = 1
    crop_size: int = 256
    lr: float = 1e-3
    save_iter: int = 200
    retrain: int = 1
    save_model: int = 1
    ckpt: int = 1
    fp16: int = 0
    scale: int = 1
    jpeg_quality: int = 50

    # --- new, TPU-native flags (not in the reference; additive only) ---
    seed: int = 0
    num_devices: int = 0          # 0 = all visible devices
    cache_images: int = 1         # cache decoded images in host RAM
    data_workers: int = 8         # host decode thread count
    ckpt_every_epochs: int = 5    # reference saves every 5 epochs
    max_to_keep: int = 3          # reference CheckpointManager(max_to_keep=3)
    steps_per_epoch: int = 0      # 0 = derived from dataset size
    log_images: int = 1           # write TensorBoard image panels
    bf16_rule: str = "compute"    # 'compute': bf16 activations, f32 params
    profile_dir: str = ""         # capture a jax.profiler trace of one epoch
    check_numerics: int = 1       # raise on NaN/Inf losses at log points

    # ------------------------------------------------------------------
    def suffix_model_name(self) -> None:
        """``model_name += _{scale}x_{jpeg_quality}q[_fp16]``
        (reference: /root/reference/train_srgan.py:308-314)."""
        self.model_name = self.model_name + f"_{self.scale}x_{self.jpeg_quality}q"
        if self.fp16:
            self.model_name = self.model_name + "_fp16"

    def finalize(self) -> "TrainConfig":
        """Post-parse coercions as /root/reference/train_srgan.py:297-306."""
        self.image_dir = get_path(self.image_dir)
        self.model_dir = get_path(self.model_dir)
        self.logdir = get_path(self.logdir)
        self.retrain = bool(self.retrain)
        self.save_model = bool(self.save_model)
        self.ckpt = bool(self.ckpt)
        self.fp16 = bool(self.fp16)
        self.jpeg_quality = int(self.jpeg_quality)
        return self

    @property
    def hr_size(self) -> int:
        return self.crop_size

    @property
    def lr_size(self) -> int:
        return self.crop_size // self.scale

    def echo(self) -> None:
        """Full flag echo (reference: /root/reference/train_srgan.py:324-325)."""
        for k, v in dataclasses.asdict(self).items():
            print(f"  {k}:".ljust(20) + f"{v!r}".ljust(70) + f"['{type(v).__name__}']")


# Per-trainer defaults, byte-for-byte from the reference params dicts.
TRAINER_DEFAULTS: dict[str, dict[str, Any]] = {
    # /root/reference/train_autoencoder.py:244-260
    "autoencoder": dict(
        model_name="autoencoder",
        image_dir="train/image_input/DIV2K_train_HR",
        fp16=0,
        scale=1,
        jpeg_quality=50,
    ),
    # /root/reference/train_pix2pix.py:198-211 (+ fixed missing flags)
    "pix2pix": dict(
        model_name="pix2pix",
        image_dir="~/Data/DIV2K/DIV2K_train_HR",
        retrain=0,
        fp16=0,
        scale=1,
        jpeg_quality=50,
    ),
    # /root/reference/train_srgan.py:262-278
    "srgan": dict(
        model_name="srgan",
        image_dir="train/image_input",
        fp16=1,
        scale=4,
        jpeg_quality=50,
    ),
    # /root/reference/train_fsrgan.py:265-281
    "fsrgan": dict(
        model_name="fsrgan",
        image_dir="train/image_input/DIV2K_train_HR",
        fp16=0,
        scale=4,
        jpeg_quality=50,
    ),
}


def make_config(trainer: str, **overrides: Any) -> TrainConfig:
    base = dict(TRAINER_DEFAULTS[trainer])
    base.update(overrides)
    return TrainConfig(**base)


def build_parser(trainer: str) -> ArgumentParser:
    """Emit the params-dict-driven parser exactly like the reference
    (/root/reference/train_srgan.py:280-284): one flag per dataclass field,
    typed from its default."""
    cfg = make_config(trainer)
    parser = ArgumentParser(description=f"denoise_gan_tpu {trainer} trainer")
    for f in dataclasses.fields(TrainConfig):
        default = getattr(cfg, f.name)
        parser.add_argument("--" + f.name, default=default, type=type(default))
    return parser


def parse_args(trainer: str, argv: list[str] | None = None,
               suffix_name: bool = True) -> TrainConfig:
    args = build_parser(trainer).parse_args(argv)
    cfg = TrainConfig(**vars(args)).finalize()
    if suffix_name:
        cfg.suffix_model_name()
    return cfg
