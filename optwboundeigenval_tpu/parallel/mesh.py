"""Device mesh construction and sharding helpers.

The reference is single-process, single-device (opt.py:246-251) with no
distributed backend (SURVEY.md §2.9).  Here parallelism is first-class:

  * a 1-D (or 2-D) ``jax.sharding.Mesh`` with a ``data`` axis (and an
    optional ``model`` axis for sharding large parameters);
  * batches sharded over ``data``; params/eigenvector replicated;
  * the mean-loss reduction inside the jitted train step makes XLA
    insert ``psum`` over ICI for gradients AND Hessian-vector products
    (HVPs are batch reductions, so the power iteration data-parallelizes
    for free — the design SURVEY.md §2.9 calls for).

Multi-host: call :func:`init_distributed` before building the mesh;
``jax.devices()`` then spans all hosts and each host feeds its local
shard of the batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, **kw) -> None:
    """Multi-host initialization (jax.distributed).  No-op when running
    single-process."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.  ``data`` defaults to
    ``n_devices // model``.  The ``data`` axis should map to the
    fastest ICI dimension (device order from ``jax.devices()`` follows
    the slice topology)."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // model
    assert data * model <= len(devs), (data, model, len(devs))
    arr = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the ``data`` axis."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_batch(batch, mesh: Mesh):
    """Place a batch dict on the mesh, leading dim split over ``data``."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, eigenvector, optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
