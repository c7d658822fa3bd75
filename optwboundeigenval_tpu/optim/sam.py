"""Sharpness-Aware Minimization.

Capability parity with the reference SAM wrapper (sam.py:6-65) and its
invocation protocol in the training loop (opt.py:688-694):

  1. perturb ``w <- w + rho * d / |d|`` where ``d`` is the current
     (regularized) gradient direction (``first_step``, sam.py:17-29;
     adaptive variant scales by ``w^2``);
  2. re-evaluate the plain loss gradient at the perturbed point;
  3. restore ``w`` and apply the base optimizer with the new gradient
     (``second_step``, sam.py:31-40).

Here the two torch steps collapse into one pure function: the trainer
hands in ``grad_fn`` (plain loss+grad on the current batch) and the
whole thing jits into the train step — no in-place parameter mutation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from optwboundeigenval_tpu.optim.api import Optimizer
from optwboundeigenval_tpu.utils.tree import tree_vdot


def SAM(
    base: Optimizer,
    rho: float = 0.05,
    adaptive: bool = False,
) -> Optimizer:
    """Wrap a base :class:`Optimizer` with SAM.  ``base`` must be an
    optax-backed optimizer (from_optax/sgd/adam)."""
    assert rho >= 0.0, f"Invalid rho, should be non-negative: {rho}"
    base_tx = base.tx
    assert base_tx is not None, "SAM requires an optax-backed base optimizer"

    def init(params):
        return base_tx.init(params)

    def step(direction, state, params, *, grad_fn=None, rng=None, **_):
        assert grad_fn is not None, "SAM requires grad_fn (two forward-backwards)"
        if adaptive:
            scaled = jax.tree.map(lambda w, g: jnp.abs(w) * g, params, direction)
        else:
            scaled = direction
        grad_norm = jnp.sqrt(tree_vdot(scaled, scaled))
        scale = rho / (grad_norm + 1e-12)
        perturbed = jax.tree.map(
            lambda w, g: w + (w**2 if adaptive else 1.0) * g * scale,
            params,
            direction,
        )
        _, grads2 = grad_fn(perturbed)
        updates, new_state = base_tx.update(grads2, state, params)
        return optax.apply_updates(params, updates), new_state

    return Optimizer(name="SAM", init=init, step=step, tx=base_tx)
