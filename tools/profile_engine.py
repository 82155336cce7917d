#!/usr/bin/env python
"""Capture + parse a jax.profiler trace of a kernel engine at 1080p.

Round-2's two biggest wins (the 8.26 ms u8-flat reshape, the 2.3 ms root
layout copy) were invisible in stage math and obvious in the trace — this
tool makes that loop repeatable: build the engine, trace N frames, parse
the trace.json.gz, group device events by name, print per-frame ms ranked.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/profile_engine.py [fsrgan|srgan] [bf16|q8] [n_frames]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def parse_trace(trace_dir: str, n_frames: int):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        print("no trace found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU (axon exposes the
    # device as "/device:TPU:0"-style); fall back to all complete events.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n.upper() or "device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        agg[e["name"]] += e.get("dur", 0) / 1e3  # us -> ms
        cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"\ntrace {os.path.basename(path)}: {total:.1f} ms device total, "
          f"{total/n_frames:.1f} ms/frame over {n_frames} frames")
    print(f"{'ms/frame':>9}  {'count':>5}  name")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms/n_frames:9.2f}  {cnt[name]:5d}  {name[:90]}")


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "fsrgan"
    mode = sys.argv[2] if len(sys.argv) > 2 else "q8"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from denoise_gan_tpu.infer.kernel_engine import (
        build_fsrgan_kernel_engine, build_srgan_kernel_engine)
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    bundle = build_models(family, scale=4, fp16=True)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 124, 124, 3), jnp.float32), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    build = (build_fsrgan_kernel_engine if family == "fsrgan"
             else build_srgan_kernel_engine)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]
    kw = dict(q8_calib_frame=frames[0]) if mode == "q8" else {}
    eng = build(params, stats, H, W, **kw)
    eng(frames[0]).block_until_ready()  # compile outside the trace

    trace_dir = f"/tmp/prof_{family}_{mode}"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        out = None
        for i in range(n):
            out = eng(frames[i % 2])
        out.block_until_ready()
        # force through the tunnel (block_until_ready alone can lie here)
        float(jnp.sum(out.astype(jnp.float32)[:8, :8]))
    parse_trace(trace_dir, n)


if __name__ == "__main__":
    main()
