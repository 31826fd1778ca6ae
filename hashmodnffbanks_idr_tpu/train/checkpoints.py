"""Checkpoint store: params / optimizer state / scheduler step / camera poses.

Role-parity with idr_train.py:181-216 (numbered + ``latest`` checkpoints in
ModelParameters / OptimizerParameters / ... subdirs): here the whole
train-state pytree (params, optax state incl. the schedule step, pose vecs,
camera optimizer state, epoch) is one atomic msgpack file per epoch plus
``latest.msgpack`` — robust to the failsafe-restart pattern (SURVEY.md §2.8).
flax.serialization.to_state_dict handles optax namedtuple states.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, epoch: int, state: Dict[str, Any]) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = dict(state)
    payload["epoch"] = int(epoch)
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(payload))
    )
    for name in (f"{epoch}.msgpack", "latest.msgpack"):
        tmp = os.path.join(ckpt_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(ckpt_dir, name))


def load_checkpoint(ckpt_dir: str, name: str = "latest",
                    template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is not None:
        tmpl = dict(template)
        tmpl["epoch"] = 0
        return serialization.from_state_dict(tmpl, raw)
    return raw


def latest_exists(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "latest.msgpack"))
