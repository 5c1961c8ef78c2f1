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


_META_FILE = "meta.json"


def _index_key(index) -> str:
    """Stable string key for a shard's global-slice index."""
    return ";".join(f"{s.start or 0}:{s.stop}" for s in index)


def save_sharded(path: str | pathlib.Path, arrays: Mapping[str, Any],
                 config: Any = None, step: int = 0, time: float = 0.0) -> None:
    """Multi-host-safe checkpoint of sharded ``jax.Array``s (SURVEY §5.4).

    ``path`` is a directory: every process writes ONLY its addressable
    shards to ``proc{k}.npz`` (no cross-host gather, no host ever holds the
    global array — the property that matters at the >=2-host scale
    BASELINE.json targets), and process 0 writes ``meta.json`` with the
    validated-on-load metadata: config, step/time, global shapes/dtypes,
    and each array's partition layout.  Writes are atomic per file
    (temp + rename), so an interrupted save never corrupts a restart point.
    """
    import jax

    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    proc = jax.process_index()

    payload: dict[str, np.ndarray] = {}
    layout: dict[str, Any] = {}
    for name, arr in arrays.items():
        shards = getattr(arr, "addressable_shards", None)
        if shards is None:  # plain numpy/host array: treat as one shard
            payload[f"{name}|{_index_key(tuple(slice(0, s) for s in np.shape(arr)))}"] = np.asarray(arr)
        else:
            for sh in shards:
                idx = tuple(
                    slice(s.start or 0, s.stop if s.stop is not None else dim)
                    for s, dim in zip(sh.index, arr.shape))
                payload[f"{name}|{_index_key(idx)}"] = np.asarray(sh.data)
        dtype = arr.dtype if hasattr(arr, "dtype") else np.asarray(arr).dtype
        layout[name] = {
            "shape": list(np.shape(arr)),
            "dtype": str(dtype),
            "spec": str(getattr(getattr(arr, "sharding", None), "spec", "")),
        }

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path / f"proc{proc}.npz")
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise

    if proc == 0:
        meta = {
            "format_version": FORMAT_VERSION,
            "step": int(step),
            "time": float(time),
            "config": _config_dict(config),
            "layout": layout,
            "num_processes": jax.process_count(),
        }
        fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, path / _META_FILE)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise


def load_sharded(path: str | pathlib.Path, shardings: Mapping[str, Any],
                 config: Any = None):
    """Restore sharded arrays saved by :func:`save_sharded`.

    ``shardings`` maps array name -> target ``jax.sharding.Sharding``; each
    process materialises only its addressable blocks
    (``jax.make_array_from_single_device_arrays``), reading whichever
    ``proc*.npz`` files contain them.  Config validation as in
    :func:`load`; the stored partition spec is also checked against the
    target sharding so a layout change fails loudly instead of silently
    reshuffling.
    """
    import jax

    path = pathlib.Path(path)
    meta = json.loads((path / _META_FILE).read_text())
    if meta.get("format_version") != FORMAT_VERSION:
        raise CheckpointMismatch(
            f"{path.name}: format {meta.get('format_version')} != {FORMAT_VERSION}")
    if config is not None:
        want = _config_dict(config)
        got = meta.get("config", {})
        diffs = {k: (got.get(k), v) for k, v in want.items()
                 if k in got and got[k] != v}
        if diffs:
            raise CheckpointMismatch(f"{path.name}: config mismatch {diffs}")

    # index -> chunk, per array name, scanned lazily across proc files
    chunks: dict[str, dict[str, np.ndarray]] = {}
    for f in sorted(path.glob("proc*.npz")):
        with np.load(f) as z:
            for key in z.files:
                name, ik = key.rsplit("|", 1)
                chunks.setdefault(name, {})[ik] = z[key]

    out = {}
    for name, sharding in shardings.items():
        lay = meta["layout"][name]
        shape = tuple(lay["shape"])
        stored_spec = lay.get("spec", "")
        if stored_spec and str(getattr(sharding, "spec", "")) != stored_spec:
            raise CheckpointMismatch(
                f"{name}: stored partition {stored_spec} != target "
                f"{getattr(sharding, 'spec', '')}")
        pieces = []
        for dev, idx in sharding.addressable_devices_indices_map(shape).items():
            full = tuple(
                slice(s.start or 0, s.stop if s.stop is not None else dim)
                for s, dim in zip(idx, shape))
            ik = _index_key(full)
            if ik not in chunks.get(name, {}):
                raise CheckpointMismatch(
                    f"{name}: no stored chunk for block {ik} "
                    f"(saved on a different layout?)")
            pieces.append(jax.device_put(
                chunks[name][ik].astype(lay["dtype"]), dev))
        out[name] = jax.make_array_from_single_device_arrays(
            shape, sharding, pieces)
    return out, meta


def export_reference_text(path, u: np.ndarray, q: np.ndarray) -> None:
    """Write a reference-format two-column state file (droplet.py:556-562)."""
    u = np.asarray(u).reshape(-1)
    q = np.asarray(q).reshape(-1)
    with open(path, "w") as f:
        for ui, qi in zip(u, q):
            f.write(f"{float(ui)} {float(qi)}\n")
