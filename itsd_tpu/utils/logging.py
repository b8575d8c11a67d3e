"""Structured JSONL metrics logging + step timing.

Replaces the reference's print/tqdm-postfix observability
(`/root/reference/Diffusion/Train.py:145-163,706-711`) and the
`metrics_history.json` dump (`abstract_metrics_from_pretrained_ddpm.py:
631-646`) with an append-only JSONL stream that tools can tail.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, also_print: bool = True):
        self.path = path
        self.also_print = also_print
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("time", time.time())
        line = json.dumps(record, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.also_print:
            short = {k: (round(v, 6) if isinstance(v, float) else v)
                     for k, v in record.items() if k != "time"}
            print(short)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


class StepTimer:
    """Wall-clock per-phase timing (the reference only times whole epochs,
    `Train.py:684,805`)."""

    def __init__(self):
        self._start = {}
        self.totals = {}

    def start(self, phase: str) -> None:
        self._start[phase] = time.perf_counter()

    def stop(self, phase: str) -> float:
        dt = time.perf_counter() - self._start.pop(phase)
        self.totals[phase] = self.totals.get(phase, 0.0) + dt
        return dt
