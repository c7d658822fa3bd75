"""Entropy-SGD: local-entropy smoothing via inner Langevin (SGLD) steps
around a weight anchor.

Capability parity with the reference ``EntropySGD`` (optim.py:10-104):
L inner SGLD steps with exponentially growing scope
``g = g0 * (1 + g1)^t`` (optim.py:60), inner exponential weight
averaging ``mw`` with ``beta1 = 0.75`` and inner lr ``0.1``
(optim.py:48-49), outer (nesterov-)momentum step on ``w - <w>``
(optim.py:84-102).

TPU-native: the inner loop is a ``lax.scan``; noise comes from an
explicit rng; no in-place parameter mutation.

Reference quirk (documented, not silently copied): the closure the
reference training loop feeds to EntropySGD (opt.py:676-687) never
recomputes gradients, so its inner loop integrates a *stale* gradient
field mutated in place.  The upstream algorithm (ucla-vision/
entropy-sgd) recomputes the gradient each inner step.  Default here is
``recompute_grads=True`` (the real algorithm); set it to ``False`` to
reproduce the reference's stale-gradient dynamics exactly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from optwboundeigenval_tpu.optim.api import Optimizer


class EntropySGDState(NamedTuple):
    t: jax.Array  # outer step count
    mdw: Any  # outer momentum buffer
    lr: jax.Array  # outer learning rate (scheduler-adjustable)
    mf: jax.Array = None  # last closure loss (optim.py:24 ``mf``)
    merr: jax.Array = None  # last closure error % (optim.py:24 ``merr``)


def accuracy(output, target, topk=(1,)):
    """precision@k percentages — the reference's closure helper
    (optim.py:107-121) used to report err% = 100 - prec1
    (opt.py:673-687)."""
    maxk = max(topk)
    pred = jnp.argsort(output, axis=-1)[:, ::-1][:, :maxk]  # (B, maxk)
    correct = pred == target[:, None]
    return [
        100.0 * jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32))
        for k in topk
    ]


def EntropySGD(
    lr: float = 0.1,
    momentum: float = 0.9,
    damp: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = True,
    L: int = 0,
    eps: float = 1e-4,
    g0: float = 1e-4,
    g1: float = 1e-3,
    inner_lr: float = 0.1,
    beta1: float = 0.75,
    recompute_grads: bool = True,
) -> Optimizer:
    def init(params):
        return EntropySGDState(
            t=jnp.zeros((), jnp.int32),
            mdw=jax.tree.map(jnp.zeros_like, params),
            lr=jnp.asarray(lr, jnp.float32),
            mf=jnp.zeros((), jnp.float32),
            merr=jnp.zeros((), jnp.float32),
        )

    def momentum_step(dw, mdw, w):
        if weight_decay > 0:
            dw = jax.tree.map(lambda d, p: d + weight_decay * p, dw, w)
        if momentum > 0:
            mdw = jax.tree.map(lambda m, d: momentum * m + (1 - damp) * d, mdw, dw)
            if nesterov:
                dw = jax.tree.map(lambda d, m: d + momentum * m, dw, mdw)
            else:
                dw = mdw
        return dw, mdw

    def step(direction, state, params, *, grad_fn=None, rng=None,
             err_fn=None, **_):
        assert grad_fn is not None and rng is not None, (
            "EntropySGD requires grad_fn (inner SGLD) and rng (noise)"
        )
        # the reference closure's (mf, merr) — loss and error % at the
        # anchor, recorded per step (optim.py:24, opt.py:673-687)
        if err_fn is not None:
            mf, merr = err_fn(params)
        else:
            mf, merr = state.mf, state.merr
        g_scope = g0 * (1 + g1) ** state.t.astype(jnp.float32)
        noise_scale = eps / jnp.sqrt(0.5 * inner_lr)
        wc = params  # anchor

        def inner(carry, key):
            w, mw, lmdw, dw_prev = carry
            if recompute_grads:
                _, dw = grad_fn(w)
            else:
                dw = dw_prev  # reference stale-gradient field (opt.py:676-687)
            dw, lmdw = momentum_step(dw, lmdw, w)
            leaves = jax.tree_util.tree_leaves(w)
            keys = jax.random.split(key, len(leaves))
            keytree = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(w), list(keys)
            )
            dw = jax.tree.map(
                lambda d, p, pc, k: d
                - g_scope * (pc - p)
                + noise_scale * jax.random.normal(k, p.shape, p.dtype),
                dw,
                w,
                wc,
                keytree,
            )
            w = jax.tree.map(lambda p, d: p - inner_lr * d, w, dw)
            mw = jax.tree.map(lambda m, p: beta1 * m + (1 - beta1) * p, mw, w)
            return (w, mw, lmdw, dw), None

        if L > 0:
            keys = jax.random.split(rng, L)
            init_carry = (
                params,
                params,
                jax.tree.map(jnp.zeros_like, params),
                direction,
            )
            (w_end, mw, _, _), _ = jax.lax.scan(inner, init_carry, keys)
            # restore anchor; outer gradient is w_anchor - <w> (optim.py:84-88)
            outer_grad = jax.tree.map(lambda pc, m: pc - m, wc, mw)
        else:
            outer_grad = direction

        # the reference warm-starts the outer momentum buffer with the
        # entry gradient on the FIRST step (state['mdw'] =
        # deepcopy(w.grad.data), optim.py:43-46) — not zeros
        first = state.t == 0
        mdw_prev = jax.tree.map(
            lambda z, d: jnp.where(first, d, z), state.mdw, direction
        )
        dw, mdw = momentum_step(outer_grad, mdw_prev, wc)
        new_params = jax.tree.map(lambda p, d: p - state.lr * d, wc, dw)
        return new_params, EntropySGDState(t=state.t + 1, mdw=mdw,
                                           lr=state.lr, mf=mf, merr=merr)

    opt = Optimizer(name="EntropySGD", init=init, step=step, tx=None)
    object.__setattr__(opt, "wants_err", True)
    return opt
