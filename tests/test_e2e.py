"""End-to-end smoke: train a tiny fsrgan on synthetic data through the real
training loop (checkpoint + TB + export), then run the still-image and
unit_test inference paths on the export (SURVEY.md §4 plan)."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture
def workspace(tmp_path, rng, monkeypatch):
    """Isolated cwd with a synthetic dataset (models/ and logs/ land here)."""
    data = tmp_path / "data" / "cls"
    data.mkdir(parents=True)
    for i in range(4):
        np.save(str(data / f"im{i}.npy"),
                rng.random((48, 48, 3)).astype(np.float32))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_train_export_infer_cycle(workspace):
    from denoise_gan_tpu.train.loop import train
    from denoise_gan_tpu.utils.config import make_config

    cfg = make_config("fsrgan", image_dir=str(workspace / "data"))
    cfg.crop_size = 32
    cfg.batch_size = 2
    cfg.epochs = 2
    cfg.save_iter = 2
    cfg.num_devices = 1
    cfg.finalize()
    cfg.suffix_model_name()
    assert cfg.model_name == "fsrgan_4x_50q"

    state = train(cfg, "fsrgan")
    assert int(state.step) == 4  # 2 epochs x 2 steps

    # artifacts
    export = workspace / "models" / "fsrgan_4x_50q.dgt"
    assert export.exists()
    ckpt_dir = workspace / "models" / "checkpoints" / "fsrgan_4x_50q"
    assert any(ckpt_dir.iterdir())
    logdir = workspace / "logs" / "fsrgan_4x_50q"
    runs = list(logdir.iterdir())
    assert runs, "no TB run dir"
    events = runs[0] / "events.jsonl"
    lines = [json.loads(l) for l in events.read_text().splitlines()]
    tags = {l["tag"] for l in lines}
    assert "Discriminator Losses/disc_loss" in tags
    assert "Quality/psnr" in tags

    # resume: retrain=1 restores the saved step counter
    cfg2 = make_config("fsrgan", image_dir=str(workspace / "data"))
    cfg2.crop_size = 32
    cfg2.batch_size = 2
    cfg2.epochs = 1
    cfg2.save_iter = 2
    cfg2.num_devices = 1
    cfg2.retrain = 1
    cfg2.finalize()
    cfg2.suffix_model_name()
    state2 = train(cfg2, "fsrgan")
    assert int(state2.step) > 4

    # still-image inference on the export
    from denoise_gan_tpu.infer.image import build_parser, run
    img_dir = workspace / "imgs"
    img_dir.mkdir()
    np.save(str(img_dir / "a.npy"),
            np.random.default_rng(1).random((32, 32, 3)).astype(np.float32))
    out_dir = workspace / "out"
    args = build_parser().parse_args(
        ["--image_dir", str(img_dir), "--output_dir", str(out_dir),
         "--model", str(export)])
    written = run(args)
    assert len(written) == 1 and os.path.exists(written[0])

    # tiled inference agrees in shape
    args2 = build_parser().parse_args(
        ["--image_dir", str(img_dir), "--output_dir", str(out_dir / "t"),
         "--model", str(export), "--tile", "16", "--tile_overlap", "4"])
    assert len(run(args2)) == 1

    # warm start (VERDICT r1 #9): with the Orbax checkpoints gone but the
    # .dgt exports present, --retrain loads the exported weights
    # (/root/reference/autoencoder.py:141-146)
    import jax
    import shutil

    from denoise_gan_tpu.io.checkpoint import load_generator
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.train.loop import warm_start_from_exports
    from denoise_gan_tpu.train.state import create_train_state

    shutil.rmtree(ckpt_dir)
    bundle = build_models("fsrgan", scale=cfg.scale)
    fresh = create_train_state(bundle, cfg, jax.random.key(123))
    warm = warm_start_from_exports(fresh, cfg.model_name)
    _, exp_params, _ = load_generator(str(export))
    jax.tree.map(np.testing.assert_array_equal, warm.gen.params, exp_params)
    # and the discriminator came from its own export (not the fresh init)
    diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        warm.disc.params, fresh.disc.params))
    assert max(diff) > 0


def test_train_under_mesh(tmp_path, rng, monkeypatch):
    """train() through the real loop on the 8-device mesh: shard_batch,
    donated sharded state, Orbax save + restore of sharded arrays
    (VERDICT r1 #4 — the use_mesh branch had no test)."""
    import jax

    from denoise_gan_tpu.train.loop import train
    from denoise_gan_tpu.utils.config import make_config

    assert jax.device_count() >= 8
    data = tmp_path / "data" / "cls"
    data.mkdir(parents=True)
    for i in range(8):
        np.save(str(data / f"im{i}.npy"),
                rng.random((40, 40, 3)).astype(np.float32))
    monkeypatch.chdir(tmp_path)

    cfg = make_config("fsrgan", image_dir=str(tmp_path / "data"))
    cfg.crop_size = 32
    cfg.batch_size = 8
    cfg.epochs = 2
    cfg.save_iter = 1
    cfg.num_devices = 8
    cfg.finalize()
    cfg.suffix_model_name()

    state = train(cfg, "fsrgan")
    assert int(state.step) == 2  # 2 epochs x (8 imgs / batch 8)
    for leaf in jax.tree.leaves(state.gen.params):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # resume restores the sharded state through Orbax
    cfg2 = make_config("fsrgan", image_dir=str(tmp_path / "data"))
    cfg2.crop_size = 32
    cfg2.batch_size = 8
    cfg2.epochs = 1
    cfg2.save_iter = 1
    cfg2.num_devices = 8
    cfg2.retrain = 1
    cfg2.finalize()
    cfg2.suffix_model_name()
    state2 = train(cfg2, "fsrgan")
    assert int(state2.step) == 3
