"""Host-side data pipeline: decode + random crop + batch, with threaded
prefetch.  Everything else (downscale, JPEG artifacts, normalization) runs on
device (data/degrade.py).

Rebuild of the reference DataLoader (/root/reference/dataloader.py:9-229)
split at the right host/device boundary for TPU:

host (this module)                       device (degrade_pair, in the step)
------------------                       ----------------------------------
list_files(image_dir/"*/*")              bicubic downscale by `scale`
JPEG/PNG decode -> float32 [0,1]         JPEG re-compression artifacts
resize-up if smaller than crop           normalize to [-1, 1]
joint random crop (crop_size^2)
cache / shuffle / batch(drop_remainder)

Improvements over the reference (documented deviations):
* the reference `cache()`s *after* crop+JPEG, freezing each image's crop for
  all epochs (/root/reference/dataloader.py:221); we cache decoded images and
  re-crop every epoch.
* per-host file sharding for multi-host training (new capability).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from denoise_gan_tpu.utils.config import TrainConfig

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False
try:
    from PIL import Image
    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def list_images(image_dir: str) -> list[str]:
    """The reference globs image_dir/"*/*" (/root/reference/dataloader.py:28);
    fall back to flat image_dir/"*" so flat directories also work."""
    paths = sorted(glob.glob(os.path.join(image_dir, "*", "*")))
    if not paths:
        paths = sorted(p for p in glob.glob(os.path.join(image_dir, "*"))
                       if os.path.isfile(p))
    return paths


def decode_image(path: str) -> np.ndarray:
    """Decode to RGB float32 [0,1] (HWC).  Prefers the native libjpeg/libpng
    codec (denoise_gan_tpu/data/native.py), then cv2, then PIL."""
    if path.endswith(".npy"):
        img = np.load(path)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        return np.ascontiguousarray(img[..., :3].astype(np.float32))
    from denoise_gan_tpu.data import native
    if native.available():
        img = native.decode(path)
        if img is not None:
            return img.astype(np.float32) / 255.0
    if _HAS_CV2:
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise IOError(f"cannot decode {path}")
        return bgr[..., ::-1].astype(np.float32) / 255.0
    if _HAS_PIL:
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.float32) / 255.0
    raise RuntimeError("no image decoder available (cv2/PIL)")


def load_tiff(path: str) -> np.ndarray:
    """Grayscale TIFF via cv2, expanded to a trailing channel dim — parity
    with the reference's unused load_tiff (/root/reference/dataloader.py:61-73)."""
    if not _HAS_CV2:
        raise RuntimeError("load_tiff requires cv2")
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise IOError(f"cannot decode {path}")
    return img[..., None]


def _resize_up_if_needed(img: np.ndarray, crop: int) -> np.ndarray:
    """If smaller than the crop, resize to (crop, crop) bicubic
    (/root/reference/dataloader.py:51-57)."""
    h, w = img.shape[:2]
    if h >= crop and w >= crop:
        return img
    if _HAS_CV2:
        return cv2.resize(img, (crop, crop), interpolation=cv2.INTER_CUBIC)
    import jax.image
    import jax.numpy as jnp
    return np.asarray(jax.image.resize(jnp.asarray(img), (crop, crop, 3),
                                       "cubic"))


class DataPipeline:
    """Yields HR crop batches (B, crop, crop, 3) float32 in [0, 1]."""

    def __init__(self, cfg: TrainConfig, seed: int | None = None,
                 process_index: int = 0, process_count: int = 1):
        self.cfg = cfg
        self.crop = cfg.crop_size
        self.batch_size = cfg.batch_size
        paths = list_images(cfg.image_dir)
        if not paths:
            raise FileNotFoundError(f"no images under {cfg.image_dir}")
        # per-host shard (multi-host data parallelism)
        self.paths = paths[process_index::process_count]
        # Every host must run the SAME number of steps per epoch: the jitted
        # global train step, summary program, and Orbax saves are cross-process
        # collectives, so a host with one extra batch (num_images %
        # process_count != 0) would deadlock the others.  Truncate every
        # host's epoch to the all-host minimum shard size, computable locally
        # as len(all_paths) // process_count (ADVICE r3).
        self.train_size = len(paths) // process_count
        self._rng = np.random.default_rng(cfg.seed if seed is None else seed)
        self._cache: dict[str, np.ndarray] = {}
        self._cache_enabled = bool(cfg.cache_images)
        self._pool = ThreadPoolExecutor(max_workers=max(1, cfg.data_workers))

    def __len__(self) -> int:
        """Steps per epoch = num_images // batch_size, drop remainder
        (/root/reference/train_srgan.py:201)."""
        return self.train_size // self.batch_size

    # ------------------------------------------------------------------
    def _load(self, path: str) -> np.ndarray:
        img = self._cache.get(path)
        if img is None:
            img = _resize_up_if_needed(decode_image(path), self.crop)
            if self._cache_enabled:
                self._cache[path] = img
        return img

    def _crop(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        h, w = img.shape[:2]
        y = rng.integers(0, h - self.crop + 1)
        x = rng.integers(0, w - self.crop + 1)
        return img[y:y + self.crop, x:x + self.crop, :]

    def epoch(self, prefetch: int = 4) -> Iterator[np.ndarray]:
        """One shuffled pass; batches assembled by worker threads and staged
        through a bounded queue so decode overlaps device compute."""
        # Permute over the FULL local shard (may exceed train_size by one
        # image when the host holds a remainder file); only `steps` batches
        # are yielded so all hosts stay in lockstep.
        order = self._rng.permutation(len(self.paths))
        steps = len(self)
        seeds = self._rng.integers(0, 2**63 - 1, size=steps)
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def make_batch(step_idx: int) -> np.ndarray:
            rng = np.random.default_rng(seeds[step_idx])
            idxs = order[step_idx * self.batch_size:(step_idx + 1) * self.batch_size]
            imgs = list(self._pool.map(self._load,
                                       [self.paths[i] for i in idxs]))
            return np.stack([self._crop(im, rng) for im in imgs])

        def producer():
            # Exceptions (e.g. a corrupt image) are forwarded through the
            # queue and re-raised in the consumer — a silent `finally: put
            # (None)` would truncate the epoch without surfacing the error
            # (ADVICE.md r1).
            try:
                for s in range(steps):
                    if stop.is_set():
                        return
                    q.put(make_batch(s))
                q.put(None)
            except BaseException as exc:  # noqa: BLE001 — forwarded, not swallowed
                q.put(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
