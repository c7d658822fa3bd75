"""Optimizer protocol.

The reference plugs torch ``Optimizer``s into the training loop with
three special protocols (SURVEY.md §2.4): SAM's two-step
(opt.py:688-694), EntropySGD's closure (opt.py:673-687) and K-FAC's
Fisher-stat refresh (opt.py:645-652).  Here the protocol is functional:

    state  = opt.init(params)
    params, state = opt.step(direction, state, params,
                             grad_fn=..., rng=...)

``direction`` is the regularized gradient ``p = grad f + mu * grad g``
(opt.py:639) already assembled by the trainer.  ``grad_fn(params) ->
(loss, grads)`` re-evaluates the *plain* loss gradient on the current
batch — what SAM's second pass and EntropySGD's Langevin steps need.
Optimizers that don't need it ignore it, so everything stays a pure
function and the whole step jits.

``from_optax`` adapts any optax ``GradientTransformation``; learning
rates are injected via ``optax.inject_hyperparams`` so host-side
schedulers (ReduceLROnPlateau etc., optim/schedules.py) can set the lr
between epochs, mirroring torch scheduler semantics (opt.py:760-763).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import optax


GradFn = Callable[[Any], tuple]  # params -> (loss, grads)


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """A named, jittable optimizer."""

    name: str
    init: Callable[[Any], Any]
    step: Callable[..., tuple]  # (direction, state, params, *, grad_fn, rng)
    # optax tx kept for introspection / lr injection
    tx: Optional[optax.GradientTransformation] = None

    def set_learning_rate(self, state, lr):
        """Host-side lr override (for plateau-style schedulers).
        Supports optax injected hyperparams and custom optimizer states
        carrying an ``lr`` field (EntropySGD, KFAC)."""
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = lr
            return state
        if hasattr(state, "lr") and hasattr(state, "_replace"):
            import jax.numpy as jnp

            return state._replace(lr=jnp.asarray(lr, jnp.float32))
        return state

    def get_learning_rate(self, state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            return state.hyperparams["learning_rate"]
        if hasattr(state, "lr"):
            return state.lr
        return None


def from_optax(
    tx: optax.GradientTransformation, name: str = "Optax"
) -> Optimizer:
    def step(
        direction, state, params, *, grad_fn: Optional[GradFn] = None, rng=None, **_
    ):
        updates, new_state = tx.update(direction, state, params)
        return optax.apply_updates(params, updates), new_state

    return Optimizer(name=name, init=tx.init, step=step, tx=tx)


def sgd(
    learning_rate: float = 0.1,
    momentum: Optional[float] = None,
    nesterov: bool = False,
    weight_decay: float = 0.0,
) -> Optimizer:
    """torch.optim.SGD equivalent (used by most params files)."""

    def make(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov))
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(make)(learning_rate=learning_rate)
    return from_optax(tx, name="SGD")


def adam(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> Optimizer:
    """torch.optim.Adam equivalent (params/usps_CNN_*.py).

    ``weight_decay`` follows torch.optim.Adam semantics — COUPLED decay
    (wd*p added to the gradient BEFORE the Adam moments), not AdamW's
    decoupled form; params/chestxray_best_reg.py:110 relies on this."""

    def make(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.adam(learning_rate, b1=b1, b2=b2, eps=eps))
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(make)(learning_rate=learning_rate)
    return from_optax(tx, name="Adam")
