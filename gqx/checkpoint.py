"""Checkpoint / resume.

A strict superset of the reference's save-only path (reference
main.py:170-172 dumps a final state_dict with no resume): here the full
TrainState — params, batch stats, optimizer momentum, EF error state — is
serialized, and ``restore_checkpoint`` resumes training exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from flax import serialization

CKPT_NAME = "gqx_state_{step}.msgpack"


def save_checkpoint(logdir: str, state, step: int) -> str:
    os.makedirs(logdir, exist_ok=True)
    path = os.path.join(logdir, CKPT_NAME.format(step=step))
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    return path


def latest_checkpoint(logdir: str) -> Optional[str]:
    if not os.path.isdir(logdir):
        return None
    ckpts = [f for f in os.listdir(logdir) if f.startswith("gqx_state_") and f.endswith(".msgpack")]
    if not ckpts:
        return None
    ckpts.sort(key=lambda f: int(f.split("_")[2].split(".")[0]))
    return os.path.join(logdir, ckpts[-1])


def restore_checkpoint(path: str, target):
    """Restore into a template TrainState (same treedef/shapes)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
