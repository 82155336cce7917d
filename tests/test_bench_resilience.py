"""Forced-failure tests of the bench outage-resilience path (VERDICT r3 #1).

Round 3's driver bench capture failed rc=1 with a raw traceback when the
axon tunnel blipped; bench.py now retries backend acquisition with bounded
backoff and emits ONE structured JSON error line on final failure.  These
tests drive that path without any backend."""

from __future__ import annotations

import json

import pytest

from denoise_gan_tpu.utils.backend import (
    BackendUnavailable, acquire_devices, bench_error_json,
)


def test_retries_then_raises_structured():
    calls = []
    sleeps = []

    def probe():
        calls.append(1)
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "TPU backend setup/compile error")

    with pytest.raises(BackendUnavailable) as ei:
        acquire_devices(probe=probe, retries=3, backoff_s=20.0,
                        sleep=sleeps.append)
    assert len(calls) == 3                      # bounded: exactly 3 attempts
    assert sleeps == [20.0, 20.0]               # backoff between, not after
    assert ei.value.attempts == 3
    assert "UNAVAILABLE" in str(ei.value)


def test_recovers_on_later_attempt():
    state = {"n": 0}

    def probe():
        state["n"] += 1
        if state["n"] < 3:
            raise RuntimeError("tunnel down")
        return ["fake-device"]

    devices = acquire_devices(probe=probe, retries=3, backoff_s=0.0,
                              sleep=lambda s: None)
    assert devices == ["fake-device"]
    assert state["n"] == 3


def test_empty_device_list_is_a_failure():
    with pytest.raises(BackendUnavailable):
        acquire_devices(probe=lambda: [], retries=2, backoff_s=0.0,
                        sleep=lambda s: None)


def test_error_json_is_one_parseable_line():
    line = bench_error_json("1080p_fps_per_chip", "frames/sec",
                            RuntimeError("axon UNAVAILABLE"))
    assert "\n" not in line
    obj = json.loads(line)
    assert obj["metric"] == "1080p_fps_per_chip"
    assert obj["value"] is None
    assert obj["vs_baseline"] is None
    assert "axon UNAVAILABLE" in obj["error"]


def _run_bench_subprocess(extra_env: dict, timeout: int = 90):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("BENCH_CHILD", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env)


def test_bench_watchdog_kills_gil_holding_hang():
    """The tunnel's second failure mode is an indefinite HANG inside the
    plugin's C client (a bare jax.devices() blocks for minutes — observed r3
    and r4).  A hung C call can HOLD THE GIL, where no in-process
    signal/thread watchdog can run (measured: the r3-era SIGALRM watchdog
    never fired; `timeout` reaped the process at rc=124).  The supervisor
    process must kill the child and print the structured error line."""
    p = _run_bench_subprocess({"BENCH_TEST_HANG": "gil",
                               "BENCH_TIMEOUT_S": "3"})
    assert p.returncode == 1
    obj = json.loads(p.stdout.strip().splitlines()[-1])
    assert obj["value"] is None and "watchdog" in obj["error"]


def test_bench_supervisor_relays_child_error_line():
    """A child that fails cleanly prints its own structured line; the
    supervisor must relay it verbatim and preserve rc=1 without adding a
    second JSON line."""
    p = _run_bench_subprocess({"BENCH_TEST_FAIL": "forced bench failure"})
    assert p.returncode == 1
    lines = [l for l in p.stdout.strip().splitlines()
             if l.lstrip().startswith("{")]
    assert len(lines) == 1
    obj = json.loads(lines[0])
    assert obj["metric"] == "1080p_fps_per_chip"
    assert obj["value"] is None
    assert "forced bench failure" in obj["error"]


def test_probe_hang_is_retryable_per_attempt(monkeypatch):
    """Round 4's failure mode: ``jax.devices()`` HANGS (GIL-holding C call)
    rather than raising, and the in-process probe ate the bench's entire
    watchdog budget on attempt 1 (VERDICT r4 weak #1).  The subprocess probe
    must convert the hang into a per-attempt timeout and retry."""
    import time as _time

    from denoise_gan_tpu.utils.backend import subprocess_probe

    monkeypatch.setenv("BENCH_TEST_PROBE_HANG", "1")
    attempts = []

    def probe():
        attempts.append(1)
        return subprocess_probe(timeout_s=2.0)

    t0 = _time.time()
    with pytest.raises(BackendUnavailable) as ei:
        acquire_devices(probe=probe, retries=2, backoff_s=0.0,
                        sleep=lambda s: None)
    elapsed = _time.time() - t0
    assert len(attempts) == 2                     # the hang did NOT stick
    assert "hung" in str(ei.value)
    assert elapsed < 30                           # 2 x 2s probes + spawn slop


def test_bench_error_line_lands_inside_driver_budget():
    """End-to-end through bench.py: a probe hang must yield rc=1 and ONE
    structured JSON line — never rc=124 from the driver's external kill.
    Run with tiny budgets; the default-budget arithmetic is asserted in
    test_default_budgets_fit_driver_kill_window."""
    p = _run_bench_subprocess({
        "BENCH_TEST_PROBE_HANG": "1",
        "BENCH_PROBE_TIMEOUT_S": "2",
        "BENCH_RETRIES": "2",
        "BENCH_BACKOFF_S": "0",
    })
    assert p.returncode == 1
    lines = [l for l in p.stdout.strip().splitlines()
             if l.lstrip().startswith("{")]
    assert len(lines) == 1
    obj = json.loads(lines[0])
    assert obj["value"] is None and "hung" in obj["error"]


def test_default_budgets_fit_driver_kill_window():
    """The r4 capture proved the driver kills at ~25-30 min (rc=124 with
    warnings at 9:15/9:40); VERDICT r4 #1 demands the structured line land
    in <=1200 s.  Assert the shipped constants keep that promise: supervisor
    timeout <=1200 s, and worst-case acquisition (retries x probe timeout +
    backoffs) leaves >=10 min of compile headroom inside it."""
    import bench
    from denoise_gan_tpu.utils.backend import DEFAULT_PROBE_TIMEOUT_S

    assert bench.DEFAULT_TIMEOUT_S <= 1200.0
    worst_acquire = 3 * DEFAULT_PROBE_TIMEOUT_S + 2 * 20.0
    assert worst_acquire + 600.0 <= bench.DEFAULT_TIMEOUT_S


def test_bench_child_prints_error_json_on_dead_backend(monkeypatch, capsys):
    """Through bench.child_main(): a dead backend yields rc=1 and ONE
    structured JSON line on stdout (no traceback there)."""
    import bench

    def dead_probe():
        raise RuntimeError("Unable to initialize backend 'axon'")

    import denoise_gan_tpu.utils.backend as backend

    def fast_acquire(probe=None, retries=3, backoff_s=20.0, sleep=None,
                     **kw):
        return acquire_devices(probe=dead_probe, retries=retries,
                               backoff_s=0.0, sleep=lambda s: None)

    monkeypatch.setattr(backend, "acquire_devices", fast_acquire)
    with pytest.raises(SystemExit) as ei:
        bench.child_main()
    assert ei.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    obj = json.loads(out[0])
    assert obj["metric"] == "1080p_fps_per_chip" and obj["value"] is None
