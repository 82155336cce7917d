"""Tests for the natural-photo eval/train tools (VERDICT r3 weak #4).

The tools score/train on real photographs bundled with installed packages
(sklearn china/flower, matplotlib grace_hopper) — the only natural images
in this no-egress environment.  Skipped wholesale if the host image set is
absent (different base image)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import eval_natural  # noqa: E402
import train_natural  # noqa: E402

_have_photos = all(os.path.exists(p) for _, p in eval_natural.PHOTO_PATHS)
pytestmark = pytest.mark.skipif(
    not _have_photos, reason="bundled sample photographs not on this host")


def test_eval_crop_grid_covers_all_sources():
    crops = eval_natural.load_photo_crops()
    names = {n for n, _ in crops}
    assert names == {"china", "flower", "hopper"}
    assert len(crops) == 25          # 8 + 8 + 9 at 256^2 stride 128
    for _, c in crops:
        assert c.shape == (256, 256, 3) and c.dtype == np.float32
        assert 0.0 <= c.min() and c.max() <= 1.0


def test_train_corpus_build_holds_out_hopper(tmp_path):
    import argparse

    args = argparse.Namespace(data_root=str(tmp_path), textures=0)
    train_natural.build(args)
    tiles = sorted(os.listdir(tmp_path / "train" / "photos"))
    assert len(tiles) == 72          # (3x6 tiles + flips) x 2 photos
    assert all(t.startswith(("china", "flower")) for t in tiles)
    assert not any("hopper" in t for t in tiles)  # eval photo held out
    a = np.load(tmp_path / "train" / "photos" / tiles[0])
    assert a.shape == (288, 288, 3) and a.dtype == np.float32
    # flip variant is the mirrored tile, not a duplicate
    base = [t for t in tiles if not t.endswith("f.npy")][0]
    flip = base.replace(".npy", "f.npy")
    b = np.load(tmp_path / "train" / "photos" / base)
    f = np.load(tmp_path / "train" / "photos" / flip)
    np.testing.assert_array_equal(f, b[:, ::-1])


def test_train_corpus_textures_extend(tmp_path):
    """The round-5 curated texture photos diversify the corpus (the
    two-photo corpus overfit: +2.15 dB in-domain, -3.45 dB on hopper)."""
    import argparse

    have = [p for p, _ in train_natural.TRAIN_TEXTURES.values()
            if os.path.exists(p)]
    if not have:
        pytest.skip("no bundled texture photos on this host")
    args = argparse.Namespace(data_root=str(tmp_path), textures=1)
    train_natural.build(args)
    tiles = sorted(os.listdir(tmp_path / "train" / "photos"))
    assert len(tiles) > 72           # strictly extends the photo corpus
    assert not any("hopper" in t for t in tiles)
    sources = {t.split("_")[0] for t in tiles}
    assert {"china", "flower"} <= sources and len(sources) >= 4
    a = np.load(tmp_path / "train" / "photos" / tiles[-1])
    assert a.shape == (288, 288, 3) and a.dtype == np.float32
