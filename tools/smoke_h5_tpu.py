#!/usr/bin/env python
"""On-chip smoke of the .h5 interop path (VERDICT r4 #7).

The .h5 consumption is CPU-parity-tested (tests/test_convert_h5.py); this
runs the REAL video CLI twice on the same tiny clip — once consuming a
.dgt export, once the .h5 exported from it (tools/export_h5.py) — and
byte-compares the decoded output frames.  Run on the TPU chip:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/smoke_h5_tpu.py \
      [--model models/h2h_srgan_mi.dgt] [--platform cpu]

Exit 0 + "H5-SMOKE PASS" when every output frame byte-matches.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def make_clip(path: str, n: int = 4, h: int = 256, w: int = 256) -> None:
    import cv2

    rng = np.random.default_rng(7)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    assert wr.isOpened(), path
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    for i in range(n):
        frame = np.roll(base, i * 7, axis=1)
        wr.write(frame)
    wr.release()


def read_frames(path: str):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def run_cli(model: str, clip: str, out: str, env) -> None:
    cmd = [sys.executable, "infer_video.py", "--input_video", clip,
           "--output_video", out, "--model", model, "--score", "0",
           "--max_frames", "4", "--frame_start", "0"]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd="/root/repo", env=env,
                   timeout=1800)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="models/h2h_srgan_mi.dgt")
    p.add_argument("--workdir", default="/tmp/r5/h5smoke")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (cpu for a local dry run)")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    if args.platform:
        # the axon plugin (on PYTHONPATH) wins over JAX_PLATFORMS, so a CPU
        # dry run must also drop /root/.axon_site (CLAUDE.md env quirks)
        env["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu":
            env["PYTHONPATH"] = "/root/repo"

    h5_path = os.path.join(args.workdir, "model.h5")
    subprocess.run([sys.executable, "tools/export_h5.py", "--dgt",
                    args.model, "--out", h5_path], check=True,
                   cwd="/root/repo", env=env, timeout=900)

    clip = os.path.join(args.workdir, "clip.mp4")
    make_clip(clip)
    out_dgt = os.path.join(args.workdir, "out_dgt.mp4")
    out_h5 = os.path.join(args.workdir, "out_h5.mp4")
    run_cli(args.model, clip, out_dgt, env)
    run_cli(h5_path, clip, out_h5, env)

    a, b = read_frames(out_dgt), read_frames(out_h5)
    assert len(a) == len(b) and a, (len(a), len(b))
    worst = 0
    for fa, fb in zip(a, b):
        worst = max(worst, int(np.abs(fa.astype(np.int32)
                                      - fb.astype(np.int32)).max()))
    if worst == 0:
        print(f"H5-SMOKE PASS: {len(a)} frames byte-identical "
              f"({args.model} vs exported .h5)", flush=True)
        return 0
    print(f"H5-SMOKE FAIL: max decoded-frame diff {worst} u8 levels",
          flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
