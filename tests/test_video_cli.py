"""End-to-end video CLI test on CPU: synthetic mp4 in -> denoised mp4 out.

Covers the reader thread, whole-frame and tiled engine paths, the mp4
writer, and scoring (rebuild of /root/reference/infer_video.py's pipeline —
whose own VideoWriter was commented out).  The fused-kernel path is
TPU-only (tested in interpret mode by test_pallas_tail.py); here the CPU
backend selects the XLA engine.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def small_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    rng = np.random.default_rng(3)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    base = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    for i in range(5):
        w.write(np.roll(base, i * 2, axis=1))
    w.release()
    return path


@pytest.fixture(scope="module")
def ae_export(tmp_path_factory):
    """Params-only .dgt export of a freshly-initialized autoencoder."""
    from denoise_gan_tpu.io.checkpoint import export_generator
    from denoise_gan_tpu.models import build_models

    bundle = build_models("autoencoder", scale=1)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    path = str(tmp_path_factory.mktemp("m") / "autoencoder.dgt")
    export_generator(path, "autoencoder", 1, variables["params"],
                     variables.get("batch_stats", {}))
    return path


@pytest.mark.parametrize("tile,fast", [(0, 0), (32, 0), (32, 1)])
def test_video_cli_end_to_end(small_video, ae_export, tmp_path, tile, fast):
    """fast=1 with tile>0 on a 1x family exercises the crop-stitched frame
    engine path (round-2 addition); fast=0 the plain tiled/whole paths."""
    from denoise_gan_tpu.infer.video import main

    out = str(tmp_path / f"out_{tile}_{fast}.mp4")
    main(["--input_video", small_video, "--output_video", out,
          "--model", ae_export, "--max_frames", "3", "--score", "0",
          "--tile", str(tile), "--tile_overlap", "8", "--fast", str(fast)])

    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    assert ok
    assert frame.shape == (48, 64, 3)          # scale=1 family
    n = 1
    while cap.read()[0]:
        n += 1
    assert n == 3
    cap.release()


def test_video_cli_scoring(small_video, ae_export, tmp_path, capsys):
    """--score computes PSNR/SSIM against the (identity-upscaled) input."""
    from denoise_gan_tpu.infer.video import main

    main(["--input_video", small_video, "--model", ae_export,
          "--max_frames", "2", "--score", "1", "--tile", "0", "--fast", "0"])
    outtxt = capsys.readouterr().out
    assert "psnr=" in outtxt and "ssim=" in outtxt
    assert "(2 frames scored)" in outtxt


def test_video_cli_engine_print_and_score_every(small_video, ae_export,
                                                capsys):
    """The selected engine is announced (VERDICT r2 #4) and --score_every
    subsamples the scored frames."""
    from denoise_gan_tpu.infer.video import main

    main(["--input_video", small_video, "--model", ae_export,
          "--max_frames", "4", "--score", "1", "--score_every", "2",
          "--tile", "0", "--fast", "0"])
    outtxt = capsys.readouterr().out
    assert "engine: whole-frame" in outtxt
    assert "scoring every 2th frame" in outtxt
    assert "(2 frames scored)" in outtxt


def test_video_cli_kernel_tail_notice(small_video, ae_export, capsys):
    """--kernel_tail 1 on a family/backend without a kernel path prints a
    notice instead of silently ignoring the flag (ADVICE r2 #1)."""
    from denoise_gan_tpu.infer.video import main

    main(["--input_video", small_video, "--model", ae_export,
          "--max_frames", "1", "--score", "0", "--tile", "32",
          "--tile_overlap", "8", "--fast", "1", "--kernel_tail", "1"])
    outtxt = capsys.readouterr().out
    assert "--kernel_tail 1 ignored" in outtxt
    assert "engine: xla-crop" in outtxt


def test_video_cli_auto_tile_defaults(small_video, ae_export, tmp_path,
                                      capsys):
    """With no --tile given, the CLI resolves the per-family measured
    optimum (autoencoder -> 128/8, tools/sweep_tile_defaults.py) and says
    which engine it picked (VERDICT r2 #7: defaults match measured optima)."""
    from denoise_gan_tpu.infer.video import main

    out = str(tmp_path / "out_auto.mp4")
    main(["--input_video", small_video, "--output_video", out,
          "--model", ae_export, "--max_frames", "2", "--score", "0",
          "--fast", "1"])
    outtxt = capsys.readouterr().out
    assert "engine: xla-crop (128/8)" in outtxt
    assert os.path.exists(out)


def test_video_cli_writer_error_surfaces(small_video, ae_export, tmp_path,
                                         monkeypatch):
    """A failure inside the async writer thread (disk full, codec error)
    must surface as an exception at the end of the run, not vanish."""
    import cv2 as _cv2

    from denoise_gan_tpu.infer import video as vmod

    class _BoomWriter:
        def __init__(self, *a, **k):
            pass

        def write(self, *_):
            raise OSError("disk full (synthetic)")

        def release(self):
            pass

    monkeypatch.setattr(_cv2, "VideoWriter", _BoomWriter)
    out = str(tmp_path / "boom.mp4")
    with pytest.raises(OSError, match="disk full"):
        vmod.main(["--input_video", small_video, "--output_video", out,
                   "--model", ae_export, "--max_frames", "2", "--score",
                   "0", "--tile", "0", "--fast", "0"])


def test_peek_calib_frames_without_frame_count(small_video, monkeypatch,
                                               capsys):
    """Some containers/streams report CAP_PROP_FRAME_COUNT as 0; the q8
    calibration peek must fall back to sequential sampling instead of
    silently collapsing to a single frame_start frame (ADVICE r4 #4)."""
    import cv2 as _cv2

    from denoise_gan_tpu.infer import video as vmod

    class _NoCountCap(_cv2.VideoCapture):
        def get(self, prop):
            if prop == _cv2.CAP_PROP_FRAME_COUNT:
                return 0.0
            return super().get(prop)

    monkeypatch.setattr(_cv2, "VideoCapture", _NoCountCap)
    frames = vmod._peek_calib_frames(small_video, 0)
    assert frames is not None and len(frames) >= 1
    assert frames[0].shape == (48, 64, 3)
    assert "sampled" in capsys.readouterr().out  # the fallback warns
