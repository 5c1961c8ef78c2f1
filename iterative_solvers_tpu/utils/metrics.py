"""Structured per-step metrics, decoupled from the step loop (SURVEY.md §5.5).

The reference prints/plots inside the hot loop (a major serial bottleneck —
full 3-D matplotlib redraws per step, droplet.py:387-406).  Here steppers
return metric arrays from ``lax.scan`` (device-side, free) and this module
turns them into host-side records/JSONL after the fact; rendering (see
:mod:`.render`) happens from saved state, never inside the loop.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Any, Mapping

import numpy as np


@dataclasses.dataclass
class MetricsLogger:
    """Append-only JSONL metrics sink."""

    path: str | pathlib.Path | None = None
    records: list = dataclasses.field(default_factory=list)

    def log(self, step: int, **values: Any) -> None:
        rec = {"step": int(step), "wall": time.time()}
        for k, v in values.items():
            if isinstance(v, (np.ndarray, np.generic)):
                v = np.asarray(v).item() if np.ndim(v) == 0 else np.asarray(v).tolist()
            elif hasattr(v, "item") and np.ndim(v) == 0:
                v = v.item()
            rec[k] = v
        self.records.append(rec)
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def log_scan_outputs(self, arrays: Mapping[str, Any],
                         start_step: int = 0) -> None:
        """Expand stacked per-step outputs of a lax.scan into records."""
        keys = list(arrays)
        n = len(np.asarray(arrays[keys[0]]))
        host = {k: np.asarray(v) for k, v in arrays.items()}
        for i in range(n):
            self.log(start_step + i, **{k: host[k][i] for k in keys})

    def summary(self) -> dict:
        out: dict = {}
        if not self.records:
            return out
        keys = set().union(*(r.keys() for r in self.records))
        for k in keys - {"step", "wall"}:
            vals = [r[k] for r in self.records if k in r
                    and isinstance(r[k], (int, float))]
            if vals:
                out[k] = {"mean": float(np.mean(vals)),
                          "min": float(np.min(vals)),
                          "max": float(np.max(vals)),
                          "last": float(vals[-1])}
        return out
