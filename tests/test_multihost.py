"""2-process jax.distributed dryrun (VERDICT r2 #5; default-suite as of r4 —
VERDICT r3 #5: at ~100s it is cheaper than test_e2e.py and is the only
coverage of init_distributed()).  Set SKIP_MULTIHOST=1 to opt out.

The launcher asserts both processes exit cleanly, losses are finite, and
the post-step parameter checksum matches across processes (the GSPMD grad
all-reduce really synchronized them)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(bool(os.environ.get("SKIP_MULTIHOST")),
                    reason="SKIP_MULTIHOST=1 set")
def test_multihost_dryrun():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py"),
         "--port", "29533"],
        capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DRYRUN MULTIHOST ok" in out.stdout
