"""Checkpointing.

The reference saves per-epoch and best-model ``state_dict``s
(opt.py:765-769, opt.py:821-830) but NOT optimizer state.  Here a
checkpoint carries params + model_state (BN stats) + optimizer state +
the warm-started eigenvector + rng — everything needed for exact
resume (SURVEY.md §5 calls this out as the TPU-era upgrade).

Format: flax msgpack (host-portable, mesh-agnostic: arrays are fully
gathered before save and re-sharded on load by the caller).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict converts NamedTuple optimizer states and other
    # structured nodes into plain dicts msgpack can serialize
    data = serialization.msgpack_serialize(
        _to_host(serialization.to_state_dict(payload))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_like(template, payload):
    """Restore ``payload`` (msgpack dict) into the pytree structure of
    ``template`` — the analog of the reference's tolerant
    ``load_state`` (opt.py:1041-1059) for structured pytrees."""
    return serialization.from_state_dict(template, payload)
