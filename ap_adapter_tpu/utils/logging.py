"""Metrics logging: JSONL writer + optional tensorboard.

Replaces the reference's wandb/tensorboard trackers
(train_apadapter_v2.py:856, 1025-1028) with a dependency-free JSONL stream
(one line per log step) and an optional tensorboardX backend when available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: str, tensorboard_dir: Optional[str] = None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None

    def log(self, metrics: Dict[str, Any]) -> None:
        rec = dict(metrics)
        rec.setdefault("ts", time.time())
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None and "step" in rec:
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k not in ("step", "ts"):
                    self._tb.add_scalar(k, v, rec["step"])

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
