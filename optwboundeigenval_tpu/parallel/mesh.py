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
    single-process.

    On the CPU backend, cross-process collectives need an explicit
    implementation (Gloo); select it before the backend initializes so
    the multi-host path is testable without TPU pods
    (tests/test_multihost.py spawns 2 real processes through here).
    """
    if coordinator is not None:
        try:  # harmless on TPU; required for multi-process CPU
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older/newer jax without the option
            pass
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
    """Place a batch dict on the mesh, leading dim split over ``data``.

    Single-process: a plain ``device_put`` onto the batch sharding.
    Multi-process (``jax.process_count() > 1``): each host holds only
    its LOCAL shard of the global batch (the ``ArrayLoader`` with
    ``host_shard=(process_index, process_count)`` feeds per-host data,
    SURVEY §2.9), so the global array is assembled with
    ``jax.make_array_from_process_local_data``.  The global shape is
    left to be inferred from the sharding itself (global_shape=None):
    an explicit ``local * process_count`` would be wrong for meshes
    whose non-``data`` axes span processes.
    """
    if jax.process_count() > 1:

        def put(x):
            x = np.asarray(x)
            sharding = batch_sharding(mesh, x.ndim)
            return jax.make_array_from_process_local_data(sharding, x)

    else:

        def put(x):
            return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def stacked_batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Sharding for a STACK of batches (scan path): axis 0 is the scan
    (step) axis, axis 1 the batch dimension split over ``data``."""
    spec = P(None, "data", *([None] * (ndim - 2)))
    return NamedSharding(mesh, spec)


def shard_stacked_batch(batch, mesh: Mesh):
    """Place a stacked batch dict (leading axes ``(steps, batch)``) on
    the mesh — the chunked-dispatch twin of :func:`shard_batch`."""
    if jax.process_count() > 1:

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                stacked_batch_sharding(mesh, x.ndim), x
            )

    else:

        def put(x):
            return jax.device_put(x, stacked_batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, eigenvector, optimizer state).

    Multi-process: every host carries the same host-local values (same
    seeds/checkpoints), lifted to one global fully-replicated array via
    ``multihost_utils.host_local_array_to_global_array``.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
