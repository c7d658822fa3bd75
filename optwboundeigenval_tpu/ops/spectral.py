"""Spectral-radius band penalty ``g`` and its gradient contribution.

Reference semantics:
  * ``g = max(0, rho - K, Kmin - rho)`` (comp_g, opt.py:574-578);
  * ``grad g = sign * grad rho`` with ``sign = +1`` if ``rho > K`` else
    ``-1``, applied only when ``g > 0`` (opt.py:631-636);
  * ``grad rho = v^T (grad H) v`` with optional norm clipping to
    ``gradg_clip`` (comp_gradrho, opt.py:535-542);
  * total step direction ``p = grad f + mu * grad g`` (opt.py:639).

Here these are pure pytree functions composed inside the jitted train
step; the conditional "only compute grad rho when the penalty is active"
becomes a ``lax.cond`` so the third-order reverse pass is skipped by the
runtime when ``g == 0``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from optwboundeigenval_tpu.ops.curvature import (
    LossFn,
    vghv,
    vghv_microbatched,
)
from optwboundeigenval_tpu.utils.tree import (
    tree_axpy,
    tree_scale,
    tree_vdot,
    tree_zeros_like,
)


def penalty(rho: jax.Array, K: float, Kmin: float = 0.0) -> jax.Array:
    """``g = max(0, rho - K, Kmin - rho)`` (opt.py:574-578).

    Note the reference feeds a discarded estimate ``rho = -1`` straight
    into this (opt.py:517); with ``Kmin = 0`` that yields ``g = 1`` — we
    reproduce the same arithmetic for parity.
    """
    return jnp.maximum(jnp.maximum(0.0, rho - K), Kmin - rho)


def penalty_sign(rho: jax.Array, K: float) -> jax.Array:
    """Which side of the band is active: ``+1`` if ``rho > K`` else
    ``-1`` (opt.py:633)."""
    return jnp.where(rho > K, 1.0, -1.0)


def clip_by_norm(g: Any, max_norm: Optional[float]) -> Any:
    """Scale pytree ``g`` down to ``max_norm`` if it exceeds it
    (gradg_clip, opt.py:539-542)."""
    if max_norm is None:
        return g
    norm = jnp.sqrt(tree_vdot(g, g))
    scale = jnp.where(norm > max_norm, max_norm / norm, 1.0)
    return tree_scale(scale, g)


class SpectralGrad(NamedTuple):
    g: jax.Array  # penalty value
    grad_g: Any  # pytree, zero when inactive
    grad_rho: Any  # pytree, zero when inactive


def penalty_and_grad(
    loss_fn: LossFn,
    params,
    batch,
    v,
    rho: jax.Array,
    *,
    K: float,
    Kmin: float = 0.0,
    gradg_clip: Optional[float] = None,
    num_micro: int = 1,
) -> SpectralGrad:
    """Compute ``g`` and ``grad g`` with the reference's gating: the
    ``v^T (grad H) v`` pass only runs when ``g > 0`` (opt.py:631-636).

    With ``num_micro > 1`` the third-order pass is micro-batched
    (:func:`~optwboundeigenval_tpu.ops.curvature.vghv_microbatched`) so
    the trainer's ``hvp_micro`` memory bound holds on the most
    memory-hungry pass, not just the gradient/HVP ones."""
    g = penalty(rho, K, Kmin)

    def active(_):
        if num_micro > 1:
            gr = vghv_microbatched(loss_fn, params, batch, v, num_micro)
        else:
            gr = vghv(loss_fn, params, batch, v)
        gr = clip_by_norm(gr, gradg_clip)
        sign = penalty_sign(rho, K)
        return gr, tree_scale(sign, gr)

    def inactive(_):
        z = tree_zeros_like(params)
        return z, z

    grad_rho, grad_g = jax.lax.cond(g > 0, active, inactive, operand=None)
    return SpectralGrad(g=g, grad_g=grad_g, grad_rho=grad_rho)


def regularized_direction(grad_f: Any, grad_g: Any, mu: jax.Array) -> Any:
    """``p = grad f + mu * grad g`` (opt.py:639)."""
    return tree_axpy(mu, grad_g, grad_f)
