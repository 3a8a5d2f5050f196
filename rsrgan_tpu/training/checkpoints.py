"""Checkpointing with the reference's accept/reject semantics.

tf.train.Saver equivalent (models/gan_rnn_placeholder.py:26-60):
``{save_dir}/{name}-{step}.ckpt`` msgpack files, a ``checkpoint`` text file
pointing at the latest, ``max_to_keep`` rotation, and optional EMA-shadow
restore (``moving_average=True``) for eval/decode.
"""

from __future__ import annotations

import json
import os
from typing import Any, List, Optional

import flax.serialization
import jax


def _checkpoint_file(save_dir: str) -> str:
    return os.path.join(save_dir, "checkpoint")


def _list_checkpoints(save_dir: str, name: str) -> List[str]:
    if not os.path.isdir(save_dir):
        return []
    files = [f for f in os.listdir(save_dir)
             if f.startswith(name + "-") and f.endswith(".ckpt")]
    return sorted(files, key=lambda f: int(f[len(name) + 1:-5]))


def checkpoint_meta_path(save_dir: str, name: str) -> str:
    return os.path.join(save_dir, f"{name}.meta.json")


def read_checkpoint_meta(save_dir: str, name: str) -> Optional[dict]:
    """The model-config sidecar written by save_checkpoint (None for
    checkpoints from before it existed)."""
    path = checkpoint_meta_path(save_dir, name)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_checkpoint(save_dir: str, name: str, state: Any, step: int,
                    max_to_keep: int = 10,
                    meta: Optional[dict] = None) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{name}-{step}.ckpt")
    # atomic write: a crash (or a concurrent multi-host reader on a shared
    # filesystem) never observes a torn checkpoint
    with open(path + ".tmp", "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    os.replace(path + ".tmp", path)
    if meta is not None:
        # model-config sidecar: lets loaders validate wiring that the
        # parameter tree alone cannot distinguish (e.g. res_lstm_l vs
        # res_lstm_base share an identical tree shape)
        mpath = checkpoint_meta_path(save_dir, name)
        with open(mpath + ".tmp", "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(mpath + ".tmp", mpath)
    with open(_checkpoint_file(save_dir) + ".tmp", "w") as f:
        f.write(os.path.basename(path) + "\n")
    os.replace(_checkpoint_file(save_dir) + ".tmp",
               _checkpoint_file(save_dir))
    for old in _list_checkpoints(save_dir, name)[:-max_to_keep]:
        os.remove(os.path.join(save_dir, old))
    return path


def periodic_snapshot_path(save_dir: str, name: str) -> str:
    return os.path.join(save_dir, f"{name}.periodic.ckpt")


def save_periodic_snapshot(save_dir: str, name: str, state: Any) -> str:
    """Atomically overwrite the mid-iteration crash-recovery snapshot.

    The reference only checkpoints at iteration/epoch boundaries
    (scripts/train_gan_rnn_placeholder.py:535-554); with hour-long
    iterations a crash loses the whole pass. The snapshot lives outside the
    accepted-checkpoint rotation and never enters the ``checkpoint`` file.
    """
    os.makedirs(save_dir, exist_ok=True)
    path = periodic_snapshot_path(save_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    os.replace(tmp, path)
    return path


def load_newest_state(save_dir: str, name: str, target: Any):
    """Restore from the latest accepted checkpoint OR a newer periodic
    snapshot. Returns (state_or_None, source_label)."""
    ckpt = latest_checkpoint(save_dir, name)
    snap = periodic_snapshot_path(save_dir, name)
    snap_t = os.path.getmtime(snap) if os.path.isfile(snap) else None
    ckpt_t = os.path.getmtime(ckpt) if ckpt and os.path.isfile(ckpt) else None
    if snap_t is not None and (ckpt_t is None or snap_t > ckpt_t):
        with open(snap, "rb") as f:
            return flax.serialization.from_bytes(target, f.read()), "periodic"
    if ckpt_t is not None:
        return load_checkpoint(save_dir, name, target), "checkpoint"
    return None, None


def latest_checkpoint(save_dir: str, name: str) -> Optional[str]:
    ckpt_file = _checkpoint_file(save_dir)
    if os.path.isfile(ckpt_file):
        with open(ckpt_file) as f:
            candidate = f.read().strip()
        path = os.path.join(save_dir, candidate)
        if os.path.isfile(path):
            return path
    files = _list_checkpoints(save_dir, name)
    return os.path.join(save_dir, files[-1]) if files else None


def load_checkpoint(save_dir: str, name: str, target: Any,
                    model_file: Optional[str] = None,
                    moving_average: bool = False) -> Optional[Any]:
    """Restore ``target``-shaped state from the latest (or named) file.

    With ``moving_average=True``, every NetState's params are replaced by
    its EMA shadow after restore (ExponentialMovingAverage
    variables_to_restore parity, models/gan.py:48-53).
    """
    path = (os.path.join(save_dir, model_file) if model_file
            else latest_checkpoint(save_dir, name))
    if path is None or not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        state = flax.serialization.from_bytes(target, f.read())
    if moving_average:
        state = swap_in_ema(state)
    return state


def swap_in_ema(state: Any) -> Any:
    """Replace params with EMA shadows on every NetState in the tree."""
    from rsrgan_tpu.training.state import NetState

    def visit(node):
        if isinstance(node, NetState):
            return node.replace(params=jax.tree.map(lambda x: x, node.ema))
        return node

    if isinstance(node := state, NetState):
        return visit(node)
    # flax.struct dataclasses: rebuild with visited children
    changed = {}
    for field in state.__dataclass_fields__:
        val = getattr(state, field)
        if isinstance(val, NetState):
            changed[field] = visit(val)
    return state.replace(**changed) if changed else state
