"""Best-metric checkpoint save/restore with resume semantics.

Reference behaviors reproduced (solar notebook cells 61-69;
utils/model_tools.py:1128-1269):

- ModelCheckpoint(save_best_only, mode=max) on a monitored metric;
- resume = load weights + re-evaluate to seed ``checkpoint.best`` (the
  Trainer's ``seed_best_from_eval``);
- remote weights over https (Azure blob in the reference) via stdlib
  urllib — no cloud SDK required.

Format: flax msgpack for the state pytree + a JSON sidecar for step/
metric metadata. Orbax is used when available for sharded/multi-host
states; msgpack is the always-available fallback.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Any, Dict, Optional

import flax.serialization
import jax


def _to_state_dict(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(path: str, state, metrics: Optional[Dict[str, float]] = None, step: Optional[int] = None):
    """Serialize a TrainState (or any pytree) + metadata to ``path``/."""
    os.makedirs(path, exist_ok=True)
    payload = _to_state_dict(state) if hasattr(state, "params") else state
    blob = flax.serialization.to_bytes(jax.device_get(payload))
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(blob)
    meta = {"step": int(step if step is not None else 0), "metrics": metrics or {}}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, target):
    """Restore into ``target``'s structure; returns (state, meta)."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        blob = f.read()
    if hasattr(target, "params"):
        restored = flax.serialization.from_bytes(_to_state_dict(target), blob)
        state = target.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
    else:
        state = flax.serialization.from_bytes(target, blob)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_remote_weights(url: str, target):
    """Fetch a msgpack checkpoint over https into ``target``'s structure —
    the get_blob_weights equivalent (utils/model_tools.py:1178-1202)."""
    with urllib.request.urlopen(url) as resp:
        blob = resp.read()
    return flax.serialization.from_bytes(target, blob)


def save_checkpoint_orbax(path: str, state, metrics=None, step: Optional[int] = None):
    """Orbax-backed save: sharded-aware, multi-host-safe (each host writes
    its shards). Use for pod-slice training; msgpack is the single-host
    default."""
    import orbax.checkpoint as ocp

    payload = _to_state_dict(state) if hasattr(state, "params") else state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    # every process participates in the orbax save (each writes its own
    # shards), but the sidecar metadata is single-writer
    if jax.process_index() == 0:
        meta = {"step": int(step if step is not None else 0), "metrics": metrics or {}}
        with open(os.path.join(path, "scv_meta.json"), "w") as f:
            json.dump(meta, f)


_META_BUF = 65536


def _broadcast_meta(meta: Dict[str, Any]) -> Dict[str, Any]:
    """Ship process 0's sidecar meta to every host (fixed-size uint8
    buffer, 4-byte length prefix) — hosts without a shared checkpoint
    filesystem would otherwise silently restore meta={}."""
    import numpy as np
    from jax.experimental import multihost_utils

    raw = json.dumps(meta).encode() if jax.process_index() == 0 else b""
    if len(raw) > _META_BUF - 4:
        # raising here (process 0 only) would leave the other hosts inside
        # broadcast_one_to_all and deadlock the collective — degrade to the
        # step field plus a truncation flag, which always fits, so every
        # host completes the broadcast and sees the same (flagged) meta
        raw = json.dumps(
            {"step": meta.get("step", 0), "meta_truncated": True}
        ).encode()
    buf = np.zeros(_META_BUF, np.uint8)
    buf[:4] = np.frombuffer(len(raw).to_bytes(4, "little"), np.uint8)
    buf[4 : 4 + len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int.from_bytes(bytes(out[:4]), "little")
    return json.loads(bytes(out[4 : 4 + n]).decode()) if n else {}


def load_checkpoint_orbax(path: str, target):
    """Restore an orbax checkpoint into ``target``'s structure.

    The scv_meta.json sidecar is written by process 0 only; on multi-host
    runs it is read on process 0 and broadcast, so hosts without a shared
    checkpoint filesystem still restore step/metrics consistently."""
    import orbax.checkpoint as ocp

    payload = _to_state_dict(target) if hasattr(target, "params") else target
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), payload)
    meta_path = os.path.join(path, "scv_meta.json")
    meta = {}
    if jax.process_index() == 0 and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if jax.process_count() > 1:
        meta = _broadcast_meta(meta)
    if hasattr(target, "params"):
        state = target.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return state, meta
    return restored, meta


class CheckpointManager:
    """Keeps ``best`` and ``latest`` checkpoints under a root directory.

    ``backend="msgpack"`` (default) is the single-host flax format;
    ``backend="orbax"`` writes sharded-aware orbax checkpoints so
    mesh-sharded / multi-host states restore with their shardings intact
    (SURVEY §5 checkpoint/resume; the Trainer uses whichever the manager
    was built with)."""

    def __init__(self, root: str, keep_latest: bool = True, backend: str = "msgpack"):
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        self.root = root
        self.keep_latest = keep_latest
        self.backend = backend
        os.makedirs(root, exist_ok=True)

    def _save(self, path, state, metrics, step):
        if self.backend == "orbax":
            save_checkpoint_orbax(path, state, metrics, step)
        else:
            save_checkpoint(path, state, metrics, step)

    def save(self, state, step: int, metrics: Optional[Dict[str, float]] = None):
        self._save(os.path.join(self.root, "best"), state, metrics, step)
        if self.keep_latest:
            self._save(os.path.join(self.root, "latest"), state, metrics, step)

    def save_latest(self, state, step: int, metrics=None):
        self._save(os.path.join(self.root, "latest"), state, metrics, step)

    def restore(self, target, which: str = "best"):
        path = os.path.join(self.root, which)
        if self.backend == "orbax":
            return load_checkpoint_orbax(path, target)
        return load_checkpoint(path, target)

    def best_metrics(self) -> Dict[str, float]:
        meta_name = "scv_meta.json" if self.backend == "orbax" else "meta.json"
        meta_path = os.path.join(self.root, "best", meta_name)
        if not os.path.exists(meta_path):
            return {}
        with open(meta_path) as f:
            return json.load(f).get("metrics", {})
