"""Checkpoint/export round-trip tests (SURVEY.md §5 checkpoint/resume)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.io.checkpoint import (
    CheckpointManager, export_generator, load_generator,
)
from denoise_gan_tpu.models import build_models
from denoise_gan_tpu.train.state import create_train_state
from denoise_gan_tpu.utils.config import make_config


def _tiny_state():
    cfg = make_config("fsrgan")
    cfg.crop_size = 32
    cfg.finalize()
    bundle = build_models("fsrgan", scale=4)
    return bundle, cfg, create_train_state(bundle, cfg, jax.random.key(0))


def test_orbax_roundtrip_preserves_step(tmp_path):
    bundle, cfg, state = _tiny_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          epoch=jnp.asarray(2, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    mgr.save(7, state)
    assert mgr.latest_step() == 7

    _, _, fresh = _tiny_state()
    restored = mgr.restore(fresh)
    # the step counter survives resume (fixes reference quirk, srgan.py:26-27)
    assert int(restored.step) == 7 and int(restored.epoch) == 2
    for a, b in zip(jax.tree.leaves(state.gen.params),
                    jax.tree.leaves(restored.gen.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_without_checkpoint_is_noop(tmp_path):
    _, _, state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "empty"), max_to_keep=3)
    out = mgr.restore(state)
    assert int(out.step) == 0
    mgr.close()


def test_max_to_keep(tmp_path):
    bundle, cfg, state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, state.replace(step=jnp.asarray(s, jnp.int32)))
    assert mgr.latest_step() == 3
    steps = sorted(int(d) for d in os.listdir(tmp_path / "ckpt")
                   if d.isdigit())
    assert steps == [2, 3]
    mgr.close()


def test_export_load_roundtrip(tmp_path):
    bundle, cfg, state = _tiny_state()
    path = str(tmp_path / "gen.dgt")
    export_generator(path, "fsrgan", 4, state.gen.params,
                     state.gen.batch_stats)
    config, params, stats = load_generator(path)
    assert config["family"] == "fsrgan" and config["scale"] == 4
    for a, b in zip(jax.tree.leaves(state.gen.params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loaded params actually drive the generator
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    out = bundle.generator.apply(
        {"params": params, "batch_stats": stats}, x, train=False)
    assert out.shape == (1, 64, 64, 3)


def test_export_rejects_garbage(tmp_path):
    p = tmp_path / "bad.dgt"
    p.write_bytes(b"not an export")
    with pytest.raises(ValueError):
        load_generator(str(p))
