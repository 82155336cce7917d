"""Config/flag parity tests against the reference's params dicts
(SURVEY.md C15)."""

import pytest

from denoise_gan_tpu.utils.config import TRAINER_DEFAULTS, make_config, parse_args


def test_srgan_defaults_match_reference():
    """/root/reference/train_srgan.py:262-278"""
    cfg = make_config("srgan")
    assert cfg.model_name == "srgan"
    assert cfg.batch_size == 1 and cfg.epochs == 1
    assert cfg.crop_size == 256 and cfg.lr == 1e-3
    assert cfg.save_iter == 200
    assert cfg.retrain == 1 and cfg.save_model == 1 and cfg.ckpt == 1
    assert cfg.fp16 == 1 and cfg.scale == 4 and cfg.jpeg_quality == 50


def test_fsrgan_and_autoencoder_defaults():
    assert make_config("fsrgan").fp16 == 0
    assert make_config("fsrgan").scale == 4
    assert make_config("autoencoder").scale == 1
    assert make_config("pix2pix").retrain == 0


def test_model_name_suffixing():
    """_{scale}x_{jpeg_quality}q[_fp16] (/root/reference/train_srgan.py:308-314)"""
    cfg = parse_args("srgan", [])
    assert cfg.model_name == "srgan_4x_50q_fp16"
    cfg = parse_args("srgan", ["--fp16", "0", "--scale", "2",
                               "--jpeg_quality", "75"])
    assert cfg.model_name == "srgan_2x_75q"


def test_flag_parsing_and_coercions():
    cfg = parse_args("fsrgan", ["--batch_size", "8", "--retrain", "0",
                                "--lr", "2e-4"])
    assert cfg.batch_size == 8
    assert cfg.retrain is False  # int flag coerced to bool
    assert cfg.lr == 2e-4


def test_canonical_flag_set_present():
    """All 15 reference flags exist on every trainer (SURVEY.md §5 config)."""
    canonical = {"model_name", "image_dir", "model_dir", "logdir",
                 "batch_size", "epochs", "crop_size", "lr", "save_iter",
                 "retrain", "save_model", "ckpt", "fp16", "scale",
                 "jpeg_quality"}
    for trainer in TRAINER_DEFAULTS:
        cfg = make_config(trainer)
        assert canonical <= set(vars(cfg))


def test_geometry_properties():
    cfg = make_config("srgan")
    assert cfg.hr_size == 256 and cfg.lr_size == 64
