"""K-FAC natural-gradient optimizer.

Capability parity with the reference ``KFACOptimizer`` (kfac.py:11-191)
and its training-loop protocol (opt.py:645-652):

  * covariance stats refreshed every ``TCov`` steps — with targets
    sampled from the model's predictive distribution when ``kfac_rand``
    (comp_fisher, opt.py:348-360);
  * eigendecomposed inverses refreshed every ``TInv`` steps
    (kfac.py:183-184);
  * per-layer natural gradient of the incoming (regularized) direction
    (kfac.py:185-186);
  * KL-clip rescale ``nu = min(1, sqrt(kl_clip / sum(v*g*lr^2)))``
    (kfac.py:132-148);
  * SGD-with-momentum inner step, weight decay only after
    ``20 * TCov`` steps (kfac.py:150-173).

TPU-native: periodic work is ``lax.cond`` branches inside the jitted
train step (the capture forward/backward and the eighs only execute on
refresh steps); no hooks, no Python-side step counters.

Factor state shapes depend on the model, so the trainer calls
``build_extra_state`` once at init (the reference builds hook buffers
at construction, kfac.py:67-79).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from optwboundeigenval_tpu.ops import kfac as kfac_ops
from optwboundeigenval_tpu.optim.api import Optimizer


class KFACState(NamedTuple):
    steps: jax.Array
    momentum: Any
    factors: Any  # {path: LayerFactors}
    lr: jax.Array  # scheduler-adjustable learning rate


def KFAC(
    lr: float = 0.001,
    momentum: float = 0.9,
    stat_decay: float = 0.95,
    damping: float = 0.001,
    kl_clip: float = 0.001,
    weight_decay: float = 0.0,
    TCov: int = 10,
    TInv: int = 100,
    batch_averaged: bool = True,
    kfac_rand: bool = True,
) -> Optimizer:
    def init(params):
        # factors filled by build_extra_state (model-dependent shapes)
        return KFACState(
            steps=jnp.zeros((), jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
            factors=None,
            lr=jnp.asarray(lr, jnp.float32),
        )

    def build_extra_state(state, task, params, model_state, example_batch, rng):
        factors = kfac_ops.init_factors(
            task, params, model_state, example_batch, rng
        )
        return state._replace(factors=factors)

    def step(direction, state, params, *, grad_fn=None, rng=None, stats_fn=None):
        assert stats_fn is not None, (
            "KFAC requires stats_fn (activation/grad-output capture)"
        )
        assert state.factors is not None, (
            "KFAC state not initialized; trainer must call build_extra_state"
        )

        # --- periodic stats update (TCov) --------------------------------
        def do_stats(factors):
            caps = stats_fn(params, rng)
            return kfac_ops.update_factors(
                factors, caps, params, stat_decay, batch_averaged
            )

        factors = jax.lax.cond(
            state.steps % TCov == 0, do_stats, lambda f: f, state.factors
        )

        # --- periodic inverse update (TInv) ------------------------------
        factors = jax.lax.cond(
            state.steps % TInv == 0,
            kfac_ops.compute_inverses,
            lambda f: f,
            factors,
        )

        # --- natural gradient + KL clip ----------------------------------
        nat = kfac_ops.apply_to_tree(factors, direction, damping)
        # vg_sum over factored layers only (kfac.py:135-139); layers
        # without factors pass through with nat == direction and are
        # excluded in the reference — including them adds |g|^2 lr^2
        # terms; to match, walk only factored paths:
        vg_sum = _vg_sum_factored(factors, nat, direction, state.lr)
        nu = jnp.where(
            vg_sum > 0, jnp.minimum(1.0, jnp.sqrt(kl_clip / vg_sum)), 1.0
        )
        d_p = _mix_factored(factors, nat, direction, nu)

        # --- weight decay after warmup (kfac.py:161-162) -----------------
        wd_on = (weight_decay != 0) & (state.steps >= 20 * TCov)
        d_p = jax.tree.map(
            lambda d, p: d + jnp.where(wd_on, weight_decay, 0.0) * p, d_p, params
        )

        # --- momentum SGD (kfac.py:163-173) ------------------------------
        new_momentum = jax.tree.map(
            lambda b, d: momentum * b + d, state.momentum, d_p
        )
        new_params = jax.tree.map(
            lambda p, b: p - state.lr * b, params, new_momentum
        )
        return new_params, KFACState(
            steps=state.steps + 1, momentum=new_momentum, factors=factors,
            lr=state.lr,
        )

    opt = Optimizer(name="KFAC", init=init, step=step, tx=None)
    object.__setattr__(opt, "needs_stats", True)
    object.__setattr__(opt, "build_extra_state", build_extra_state)
    object.__setattr__(opt, "kfac_rand", kfac_rand)
    object.__setattr__(opt, "TCov", TCov)
    return opt


def _walk_factored(factors, tree, path=()):
    """Yield (key, subtree) for every factored layer dict in ``tree``."""
    if isinstance(tree, dict) and "kernel" in tree:
        key = "/".join(path)
        if key in factors:
            yield key, tree
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk_factored(factors, v, path + (k,))


def _vg_sum_factored(factors, nat, direction, lr):
    total = 0.0
    nat_layers = dict(_walk_factored(factors, _unfreeze(nat)))
    dir_layers = dict(_walk_factored(factors, _unfreeze(direction)))
    for key in nat_layers:
        n, d = nat_layers[key], dir_layers[key]
        total = total + jnp.sum(n["kernel"] * d["kernel"]) * lr**2
        if "bias" in n:
            total = total + jnp.sum(n["bias"] * d["bias"]) * lr**2
    return total


def _mix_factored(factors, nat, direction, nu):
    """Factored layers get ``nu * nat``; unfactored layers keep the raw
    direction (reference only overwrites grads of K-FAC'd modules,
    kfac.py:142-148)."""

    def walk(n, d, path):
        if isinstance(n, dict) and "kernel" in n:
            key = "/".join(path)
            if key in factors:
                return jax.tree.map(lambda x: nu * x, n)
            return d
        if isinstance(n, dict):
            return {k: walk(n[k], d[k], path + (k,)) for k in n}
        return d

    return walk(_unfreeze(nat), _unfreeze(direction), ())


def _unfreeze(tree):
    from flax.core import FrozenDict

    return tree.unfreeze() if isinstance(tree, FrozenDict) else tree
