"""Host data pipeline + on-device degradation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.data.degrade import degrade_pair
from denoise_gan_tpu.data.pipeline import DataPipeline, decode_image, list_images
from denoise_gan_tpu.utils.config import make_config


@pytest.fixture
def image_dir(tmp_path, rng):
    """Class-subdir layout like the reference expects (image_dir/*/*)."""
    sub = tmp_path / "cls"
    sub.mkdir()
    try:
        import cv2
        for i in range(6):
            img = (rng.random((80 + i, 96, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(sub / f"img{i}.png"), img)
    except ImportError:
        for i in range(6):
            np.save(str(sub / f"img{i}.npy"),
                    rng.random((80 + i, 96, 3)).astype(np.float32))
    return str(tmp_path)


def _cfg(image_dir, crop=32, batch=2):
    cfg = make_config("autoencoder", image_dir=image_dir)
    cfg.crop_size = crop
    cfg.batch_size = batch
    return cfg.finalize()


def test_list_images_nested_and_flat(image_dir):
    assert len(list_images(image_dir)) == 6
    flat = os.path.join(image_dir, "cls")
    assert len(list_images(flat)) == 6


def test_pipeline_shapes_and_ranges(image_dir):
    pipe = DataPipeline(_cfg(image_dir))
    assert pipe.train_size == 6
    assert len(pipe) == 3
    batches = list(pipe.epoch())
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (2, 32, 32, 3)
        assert b.dtype == np.float32
        assert b.min() >= 0.0 and b.max() <= 1.0


def test_pipeline_resizes_small_images(tmp_path, rng):
    sub = tmp_path / "c"
    sub.mkdir()
    np.save(str(sub / "small.npy"), rng.random((10, 12, 3)).astype(np.float32))
    cfg = _cfg(str(tmp_path), crop=32, batch=1)
    pipe = DataPipeline(cfg)
    (batch,) = list(pipe.epoch())
    assert batch.shape == (1, 32, 32, 3)


def test_pipeline_per_host_sharding(image_dir):
    cfg = _cfg(image_dir, batch=1)
    p0 = DataPipeline(cfg, process_index=0, process_count=2)
    p1 = DataPipeline(cfg, process_index=1, process_count=2)
    assert p0.train_size == 3 and p1.train_size == 3
    assert set(p0.paths).isdisjoint(p1.paths)


def test_pipeline_unequal_shards_truncate_to_min(tmp_path, rng):
    """6 files / 4 hosts = shards of 2,2,1,1: every host must report the
    all-host MIN step count or the jitted collective step deadlocks the
    smaller hosts (ADVICE r3)."""
    sub = tmp_path / "c"
    sub.mkdir()
    for i in range(6):
        np.save(str(sub / f"im{i}.npy"),
                rng.random((40, 40, 3)).astype(np.float32))
    cfg = _cfg(str(tmp_path), batch=1)
    pipes = [DataPipeline(cfg, process_index=i, process_count=4)
             for i in range(4)]
    assert [len(p.paths) for p in pipes] == [2, 2, 1, 1]
    assert all(p.train_size == 1 for p in pipes)   # 6 // 4
    assert all(len(p) == 1 for p in pipes)
    # every host yields exactly len(p) batches — lockstep epochs
    for p in pipes:
        assert len(list(p.epoch())) == 1


def test_train_raises_clear_error_when_dataset_smaller_than_batch(
        tmp_path, rng):
    """VERDICT r3 weak #7: train() must fail with a clear message, not a
    KeyError at the end-of-epoch print, when train_size < batch_size."""
    from denoise_gan_tpu.train.loop import train
    sub = tmp_path / "c"
    sub.mkdir()
    np.save(str(sub / "only.npy"), rng.random((40, 40, 3)).astype(np.float32))
    cfg = make_config("autoencoder", image_dir=str(tmp_path))
    cfg.crop_size = 32
    cfg.batch_size = 8          # > 1 image
    cfg.logdir = str(tmp_path / "logs")
    cfg.model_dir = str(tmp_path / "models")
    cfg.finalize()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with pytest.raises(ValueError, match="dataset too small"):
            train(cfg, "autoencoder")
    finally:
        os.chdir(cwd)


def test_pipeline_recrops_each_epoch(image_dir):
    cfg = _cfg(image_dir, batch=2)
    pipe = DataPipeline(cfg)
    e1 = np.concatenate(list(pipe.epoch()))
    e2 = np.concatenate(list(pipe.epoch()))
    assert not np.array_equal(e1, e2)  # reference froze crops after epoch 1


def test_degrade_pair_scales_and_ranges(rng):
    hr = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    lo, hi = degrade_pair(hr, scale=4, jpeg_quality=50)
    assert lo.shape == (2, 16, 16, 3)
    assert hi.shape == (2, 64, 64, 3)
    assert float(lo.min()) >= -1.0 and float(lo.max()) <= 1.0
    np.testing.assert_allclose(np.asarray(hi), np.asarray(hr) * 2 - 1,
                               atol=1e-6)


def test_degrade_pair_scale1_is_jpeg_only(rng):
    hr = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    lo, hi = degrade_pair(hr, scale=1, jpeg_quality=50)
    assert lo.shape == hi.shape
    # degraded differs from clean but is correlated
    d = np.abs(np.asarray(lo) - np.asarray(hi)).mean()
    assert 0 < d < 0.5
