#!/usr/bin/env python
"""Headline benchmark: 1080p overlap-tiled video denoising throughput,
frames/sec per chip, on the flagship FSRGAN generator (bf16 compute).

North-star metric from BASELINE.md: >30 fps 1080p denoise per chip on TPU
v5e.  Prints ONE JSON line:
  {"metric": "1080p_fps_per_chip", "value": N, "unit": "frames/sec",
   "vs_baseline": N/30}
(the reference publishes no numbers — SURVEY.md §6 — so vs_baseline is the
ratio to the driver-set 30 fps target).

Outage resilience (VERDICT r3 #1): backend acquisition is retried with
bounded backoff (3 x ~20s), and on unrecoverable failure ONE structured JSON
line with an "error" field is printed (rc=1) instead of a raw traceback —
round 3 lost its driver-verified headline to a transient axon-tunnel outage.
Hangs are covered by a PROCESS-level supervisor (the bench runs in a child;
see supervise()) because the observed hang sits inside a GIL-holding C call
where no in-process signal/thread watchdog can run.
The active mode (q8/brc/grid/frames) is echoed on stderr so captured numbers
are self-describing (VERDICT r3 #7).
"""

from __future__ import annotations

import json
import os
import sys
import time

METRIC = "1080p_fps_per_chip"
UNIT = "frames/sec"

# Watchdog budget.  The driver's round-4 capture proved its external kill
# budget is ~25-30 min (rc=124 after warnings at 9:15/9:40); the structured
# error line must land WELL inside that, so the supervisor default is 18 min
# (VERDICT r4 #1: <=1200 s).  Worst-case acquisition is bounded separately:
# 3 probe attempts x 120 s + 2 x 20 s backoff = 400 s (utils/backend.py);
# the rest of the budget covers cold remote compiles (~1-5 min/program).
DEFAULT_TIMEOUT_S = 1080.0


def run_bench() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from denoise_gan_tpu.infer.kernel_engine import build_fsrgan_kernel_engine
    from denoise_gan_tpu.models import build_models

    H, W = 1080, 1920
    FRAMES = 32

    bundle = build_models("fsrgan", scale=4, fp16=True)
    x0 = jnp.zeros((1, 124, 124, 3), jnp.float32)
    variables = bundle.generator.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)

    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.random((H, W, 3)), jnp.float32)
              for _ in range(2)]

    # fused Pallas tail kernel engine (infer/kernel_engine.py): XLA body on
    # a <=128-tile grid + up1/up2/final-conv/tanh/crop-stitch/u8 in one
    # VMEM-resident kernel; output is the kernel's 5D uint8 whose C-order
    # bytes ARE the (H*4, W*4*3) HWC stream (kernel_engine.flat_view is a
    # zero-copy host flatten — the video CLI consumes it that way).
    # w8a8 tail (int8 up2/final dots, first frame as calibration) is the
    # DEFAULT — same as the video CLI: measured ~zero added deviation vs
    # the exact whole-frame output beyond the bf16 kernel's accepted
    # envelope (tools/exp_q8_exact.py) at 1.06x fps.  BENCH_Q8=0 reverts
    # to the bf16 tail.
    q8 = int(os.environ.get("BENCH_Q8", "1"))  # 0=bf16, 1=w8a8, 2=qh8
    denoise_frame = build_fsrgan_kernel_engine(
        variables["params"], variables.get("batch_stats", {}), H, W,
        q8_calib_frame=frames[0] if q8 else None, qh8=(q8 == 2))

    # self-describing mode echo (stderr; the JSON line stays clean)
    print(f"# mode: q8={q8} engine=fsrgan_kernel "
          f"H={H} W={W} frames={FRAMES}", file=sys.stderr)

    # warmup / compile
    denoise_frame(frames[0]).block_until_ready()

    t0 = time.time()
    out = None
    for i in range(FRAMES):
        out = denoise_frame(frames[i % 2])
    out.block_until_ready()
    elapsed = time.time() - t0
    fps = FRAMES / elapsed

    print(json.dumps({
        "metric": METRIC,
        "value": round(fps, 3),
        "unit": UNIT,
        "vs_baseline": round(fps / 30.0, 3),
    }))
    print(f"# device={jax.devices()[0].device_kind} frames={FRAMES} "
          f"elapsed={elapsed:.2f}s", file=sys.stderr)


def child_main() -> None:
    """The measuring process: retrying acquisition + structured errors."""
    from denoise_gan_tpu.utils.backend import (
        BackendUnavailable, acquire_devices, bench_error_json,
    )

    try:
        # forced-failure test hooks (tests/test_bench_resilience.py)
        hang = os.environ.get("BENCH_TEST_HANG")
        if hang == "gil":
            # Faithful simulation of the observed axon failure mode: a hang
            # inside a C call that HOLDS the GIL (ctypes.PyDLL does not
            # release it), which no in-process signal/thread watchdog can
            # interrupt — only the parent supervisor can.
            import ctypes
            ctypes.PyDLL(None).sleep(600)
        elif hang:
            import time as _time
            _time.sleep(600)
        if os.environ.get("BENCH_TEST_FAIL"):
            raise RuntimeError(os.environ["BENCH_TEST_FAIL"])
        from denoise_gan_tpu.utils.backend import DEFAULT_PROBE_TIMEOUT_S
        devices = acquire_devices(
            retries=int(os.environ.get("BENCH_RETRIES", "3")),
            backoff_s=float(os.environ.get("BENCH_BACKOFF_S", "20")),
            probe_timeout_s=float(os.environ.get(
                "BENCH_PROBE_TIMEOUT_S", str(DEFAULT_PROBE_TIMEOUT_S))))
        print(f"# backend: {devices[0].platform} x{len(devices)}",
              file=sys.stderr)
        run_bench()
    except BackendUnavailable as exc:
        print(f"# backend acquisition failed after {exc.attempts} attempts",
              file=sys.stderr)
        print(bench_error_json(METRIC, UNIT, exc))
        sys.exit(1)
    except Exception as exc:  # noqa: BLE001 — structured, not a traceback
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(bench_error_json(METRIC, UNIT, exc))
        sys.exit(1)


def supervise() -> None:
    """Process-level hang watchdog.

    The axon tunnel's second observed failure mode is an indefinite HANG in
    backend init (a bare ``jax.devices()`` blocks for minutes inside the
    plugin's C client).  A SIGALRM/thread watchdog cannot fire there when the
    hung C call holds the GIL (measured: ``timeout`` killed the probe at
    rc=124 before the in-process alarm ever ran), so the watchdog must live
    in a separate PROCESS: run the bench in a child, relay its stdout, and on
    timeout kill it and print the structured error line ourselves.  Budget
    covers cold remote compiles (~1-5 min/program through the tunnel).
    """
    import subprocess
    import threading

    from denoise_gan_tpu.utils.backend import bench_error_json

    timeout_s = float(os.environ.get("BENCH_TIMEOUT_S",
                                     str(DEFAULT_TIMEOUT_S)))
    env = dict(os.environ, BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, text=True, env=env)

    seen = {"json": False}

    def relay():
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            if line.lstrip().startswith("{"):
                seen["json"] = True

    reader = threading.Thread(target=relay, daemon=True)
    reader.start()
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        reader.join(timeout=10)
        if not seen["json"]:
            print("# bench watchdog fired: backend or compile hang "
                  f"(>{timeout_s:.0f}s)", file=sys.stderr)
            print(bench_error_json(
                METRIC, UNIT, "watchdog timeout: backend or compile hang "
                "(axon tunnel unresponsive)"))
            sys.exit(1)
        sys.exit(0)  # result already relayed; only cleanup hung
    reader.join(timeout=10)
    if rc != 0 and not seen["json"]:
        print(bench_error_json(
            METRIC, UNIT, f"bench child died rc={rc} without a result line"))
        sys.exit(1)
    sys.exit(rc)


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1":
        child_main()
    else:
        supervise()


if __name__ == "__main__":
    main()
