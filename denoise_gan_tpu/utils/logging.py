"""TensorBoard observability (SURVEY.md §5 Metrics/logging).

Per-run timestamped summary dirs (`logs/{model_name}/train_{MMDD_HHMM}`,
/root/reference/train_srgan.py:211-213), scalar losses and the full set of
image panels (input/target/generated, MSE/MAE error maps, Sobel and
total-variation maps, /root/reference/train_srgan.py:140-176) every
`save_iter` steps.  Panels are computed **on device** by a jitted summary
function (train/loop.py); this module only writes.

Falls back to a JSONL event log when tensorboardX is unavailable.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime
from typing import Any

import numpy as np

try:
    from tensorboardX import SummaryWriter as _TBWriter
    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


def timestamped_run_dir(logdir: str, model_name: str) -> str:
    """logs/{model_name}/train_{MMDD_HHMM} (/root/reference/train_srgan.py:211)."""
    short = datetime.now().strftime("%m%d_%H%M")
    return os.path.join(logdir, model_name, f"train_{short}")


class SummaryWriter:
    def __init__(self, run_dir: str):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._tb = _TBWriter(run_dir) if _HAS_TB else None
        self._jsonl = open(os.path.join(run_dir, "events.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "step": step, "tag": tag, "value": value}) + "\n")

    def scalars(self, values: dict[str, Any], step: int,
                prefix: str = "") -> None:
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def image(self, tag: str, img_hwc_uint8: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(img_hwc_uint8), step,
                               dataformats="HWC")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
