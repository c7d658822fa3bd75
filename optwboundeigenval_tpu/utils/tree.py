"""Pytree vector-space helpers.

The reference flattens every parameter pytree into one dense vector and
does all eigensolver math on it (``opt.py:102``, ``opt.py:252``,
``opt.py:324-325``).  On TPU we keep vectors as pytrees matching the
parameter structure: XLA fuses the per-leaf elementwise work and avoids
the concat/reshape traffic of a flat vector, and sharded leaves stay
sharded.  These helpers provide the inner products / norms / axpy the
eigensolver needs, plus flat <-> pytree conversion at the boundary for
tests and analysis code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def tree_vdot(a, b):
    """Inner product <a, b> over two pytrees (scalar)."""
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def tree_norm(a):
    """L2 norm of a pytree (scalar)."""
    return jnp.sqrt(tree_vdot(a, a))


def tree_scale(alpha, a):
    return jax.tree.map(lambda x: alpha * x, a)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tree_axpy(alpha, x, y):
    """alpha * x + y, elementwise over pytrees."""
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_zeros_like(a):
    return jax.tree.map(jnp.zeros_like, a)


def tree_size(a) -> int:
    """Total number of scalar elements (reference ``ndim``, opt.py:252)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(a))


def tree_uniform_like(a):
    """The reference's deterministic start vector ``1/sqrt(n) * ones``
    (``random_v``, opt.py:324-325) as a pytree."""
    n = tree_size(a)
    val = 1.0 / jnp.sqrt(float(n))
    return jax.tree.map(lambda x: jnp.full_like(x, val), a)


def tree_random_like(key, a, dtype=None):
    """Gaussian random pytree with the structure/shapes of ``a``."""
    leaves, treedef = jax.tree_util.tree_flatten(a)
    keys = jax.random.split(key, len(leaves))
    new = [
        jax.random.normal(k, x.shape, dtype or x.dtype) for k, x in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


def tree_cast(a, dtype):
    return jax.tree.map(lambda x: x.astype(dtype), a)


def tree_where(pred, a, b):
    """Select pytree ``a`` where scalar ``pred`` else ``b``."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_ravel(a):
    """Flatten pytree to a 1-D vector; returns (vector, unravel_fn)."""
    return ravel_pytree(a)
