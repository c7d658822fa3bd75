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


# torch state_dict -> params-tree converters per reference architecture
# (layout mapping lives in utils/torch_interop; backbone walkers in
# scripts/convert_torch_weights)
def _torch_converters():
    from optwboundeigenval_tpu.utils.torch_interop import (
        convert_cnnusps_state_dict,
        convert_forestnet_state_dict,
    )

    out = {"forest": convert_forestnet_state_dict,
           "usps_cnn": convert_cnnusps_state_dict}
    try:
        from scripts.convert_torch_weights import CONVERTERS

        out.update(CONVERTERS)
    except ImportError:  # pragma: no cover - installed without scripts/
        pass
    return out


def load_torch_checkpoint(path: str, arch: str):
    """Reference-checkpoint interop: read a torch ``.pt`` checkpoint in
    the reference's save format (``state_dict`` possibly nested,
    ``module.``/``encoder.`` prefixes, legacy dotted keys —
    opt.py:765-769, opt.py:1041-1059) and return the converted flax
    tree for ``arch``.

    ``arch``: 'forest' | 'usps_cnn' (full params trees) or a backbone
    name from scripts/convert_torch_weights (densenet121/161/169/201,
    vgg16_bn, alexnet, resnet50 — '/'-joined ``params/...``/
    ``batch_stats/...`` mapping for ``backbones.load_pretrained_npz``-
    style overlay).  Requires torch (present in the build image; the
    compute path stays torch-free)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = dict(sd)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = dict(sd["state_dict"])  # reference nesting (opt.py:1050)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    converters = _torch_converters()
    if arch not in converters:
        raise ValueError(f"unknown arch {arch!r}; have {sorted(converters)}")
    return converters[arch](sd)


def save_torch_checkpoint(params, path: str, arch: str) -> str:
    """Reverse-interop: write a flax params tree as a torch ``.pt``
    checkpoint the REFERENCE loads natively (its ``load_state``
    tolerates plain state_dict files, opt.py:1041-1059) — so a user can
    migrate a model trained here back to the reference implementation.

    ``arch``: 'forest' | 'usps_cnn'."""
    import torch

    from optwboundeigenval_tpu.utils.torch_interop import (
        cnnusps_to_state_dict,
        forestnet_to_state_dict,
    )

    exporters = {"forest": forestnet_to_state_dict,
                 "usps_cnn": cnnusps_to_state_dict}
    if arch not in exporters:
        raise ValueError(f"unknown arch {arch!r}; have {sorted(exporters)}")
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in exporters[arch](params).items()}
    torch.save(sd, path)
    return path
