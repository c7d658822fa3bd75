"""Parameter sharding rules (tensor parallelism over the ``model``
axis).

The reference is strictly single-device (SURVEY.md §2.9; asymmetric
valley even asserts params share one device, asymmetric_valley.py:
402-427).  Here large parameter matrices can shard their output
dimension over the mesh's ``model`` axis: XLA then partitions the
matmuls/convs and inserts the collectives.  The eigensolver state
``v`` and all curvature products inherit the same shardings because
they are pytrees with the parameter structure — the power iteration
runs sharded with zero extra code.

Heuristic (``infer_param_specs``): shard the trailing (output-feature)
dimension of any kernel whose size crosses ``min_elems`` and whose
trailing dim divides the axis size; everything else replicates.  This
is the standard megatron-style column split for the forward pass; XLA
chooses the reduction pattern for the backward.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_specs(params, mesh: Mesh, min_elems: int = 2**16):
    """Pytree of PartitionSpecs for ``params``."""
    model = mesh.shape.get("model", 1)

    def spec(x):
        if (
            model > 1
            and x.ndim >= 2
            and x.size >= min_elems
            and x.shape[-1] % model == 0
        ):
            return P(*([None] * (x.ndim - 1) + ["model"]))
        return P()

    return jax.tree.map(spec, params)


def shard_params(params, mesh: Mesh, min_elems: int = 2**16):
    """Place params (or any params-structured pytree, e.g. the
    eigenvector) according to :func:`infer_param_specs`."""
    specs = infer_param_specs(params, mesh, min_elems)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
