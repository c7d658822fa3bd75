"""Matrix-free curvature kernel: Hessian-vector products and the
second-order directional derivative v^T (grad H) v.

Capability parity with the reference ``HVPOperator`` (opt.py:48-192):

  * ``Hv(v)``            -> :func:`hvp` / :func:`linearize_hvp`
  * ``vGHv(v)``          -> :func:`vghv`
  * ``stored_grad`` reuse (opt.py:86-91, one create-graph backward reused
    by every power-iteration step) -> :func:`linearize_hvp`, which calls
    ``jax.linearize(jax.grad(loss))`` once per batch and returns a cheap
    linear map.  This is the TPU-native expression of the same idea: the
    forward+backward trace is computed once and XLA re-executes only the
    linearized (JVP) pass per power iteration.

Design notes (TPU-first, not a port):
  * Everything is a pure function of ``(params, batch)`` pytrees; no
    object state.  The trainer carries state (warm-started eigenvector,
    cached gradient) explicitly.
  * The reference forces float64 (opt.py:83, opt.py:108).  TPUs have no
    native f64 MXU path; we default to the params' dtype (f32) and expose
    a ``dtype`` escape hatch for CPU-based oracle tests.
  * Under ``jit`` with a batch sharded over a ``data`` mesh axis, the
    mean-loss reduction makes XLA insert ``psum`` over ICI automatically;
    HVPs are batch reductions so data parallelism is free.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from optwboundeigenval_tpu.utils.tree import tree_vdot

# A loss function maps (params, batch) -> scalar loss.
LossFn = Callable[[Any, Any], jax.Array]


def grad(loss_fn: LossFn, params, batch):
    """Gradient of the loss at ``params`` (reference ``prepare_grad``,
    opt.py:175-192), as a pytree matching ``params``."""
    return jax.grad(loss_fn)(params, batch)


def hvp(loss_fn: LossFn, params, batch, v):
    """One-shot Hessian-vector product ``H(params) @ v``.

    Forward-over-reverse: ``jvp(grad(loss), (params,), (v,))``.  Matches
    reference ``HVPOperator.Hv`` (opt.py:77-108) without materializing H.
    Prefer :func:`linearize_hvp` when several products share one batch.
    """
    g = lambda p: jax.grad(loss_fn)(p, batch)
    return jax.jvp(g, (params,), (v,))[1]


def linearize_hvp(loss_fn: LossFn, params, batch) -> Tuple[Any, Callable[[Any], Any]]:
    """Linearize the gradient once; returns ``(grad, hvp_fn)``.

    ``hvp_fn(v)`` evaluates ``H @ v`` re-using the single linearization —
    the analog of the reference caching ``stored_grad`` with
    ``create_graph=True`` and re-issuing backward passes against it for
    every power-iteration step (opt.py:86-99, opt.py:450).  The returned
    gradient doubles as ``grad f`` for the optimizer step, exactly as the
    reference reuses ``stored_grad`` as ``gradf`` (opt.py:624-625).
    """
    g = lambda p: jax.grad(loss_fn)(p, batch)
    grads, hvp_fn = jax.linearize(g, params)
    return grads, hvp_fn


def vghv(loss_fn: LossFn, params, batch, v):
    """Second-order directional derivative ``v^T (grad H) v`` — the
    gradient of the Rayleigh quotient numerator ``v^T H(params) v`` with
    respect to ``params``.

    Reference ``HVPOperator.vGHv`` (opt.py:110-152) computes this with a
    triple backward.  Functionally it is just
    ``grad_p [ <H(p) v, v> ]``, one reverse pass over a forward-over-
    reverse HVP — a pure composition XLA compiles into a single program.
    Used for ``grad rho`` (comp_gradrho, opt.py:535-542).
    """

    def rayleigh_num(p):
        g = lambda q: jax.grad(loss_fn)(q, batch)
        hv = jax.jvp(g, (p,), (v,))[1]
        return tree_vdot(hv, v)

    return jax.grad(rayleigh_num)(params)


def _micro_slices(batch, num_micro: int):
    lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
    assert lead % num_micro == 0, (lead, num_micro)
    mb = lead // num_micro

    def slice_i(i):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, i * mb, mb, 0), batch
        )

    return slice_i, mb


def _batch_weight(batch):
    """Total example weight of a batch (sum of padding weights if
    present, else the leading dimension)."""
    if "w" in batch:
        return jnp.sum(batch["w"])
    return jnp.asarray(
        jax.tree_util.tree_leaves(batch)[0].shape[0], jnp.float32
    )


def hvp_microbatched(
    loss_fn: LossFn, params, batch, v, num_micro: int, *, use_pallas: bool = False
):
    """Hessian-vector product accumulated over micro-batches.

    The linearization of a large model at full batch size holds O(B)
    activations; splitting the batch into ``num_micro`` chunks bounds
    memory at O(B / num_micro) while the accumulated product is exact
    for weighted-mean losses: each micro-loss is re-weighted by
    ``sum(w_micro) / sum(w_total)`` so that micro-HVPs sum to the
    full-batch HVP.  (Losses that are not weighted means over examples
    — e.g. the per-class-normalized W-BCE — decompose only
    approximately.)

    The whole loop is a ``lax.scan`` so one micro-batch graph is
    compiled.  ``use_pallas`` switches the running accumulation to a
    Pallas axpy per leaf (ops/pallas_kernels.axpy_accumulate) —
    measured SLOWER than XLA's fused accumulate on the realistic shape
    (DenseNet121@64px batch 64, micro 4: 73.4 vs 95.4 micro-HVP/s,
    0.77x; RESULTS.md round 2), so the XLA path is the default and the
    kernel is kept as an experiment.

    This realizes the micro-batched HVP solver design (SURVEY.md §7 /
    BASELINE.json north star); the reference caps memory by capping the
    batch itself (``max_samples``, opt.py:276 — stored but unused).
    """
    from optwboundeigenval_tpu.ops import pallas_kernels
    from optwboundeigenval_tpu.utils.tree import tree_zeros_like

    slice_i, _ = _micro_slices(batch, num_micro)
    w_total = _batch_weight(batch)

    def body(acc, i):
        mbatch = slice_i(i)
        scale = _batch_weight(mbatch) / jnp.maximum(w_total, 1e-12)

        g = lambda p: jax.grad(loss_fn)(p, mbatch)
        hv_m = jax.jvp(g, (params,), (v,))[1]
        if use_pallas:
            acc = jax.tree.map(
                lambda a, d: pallas_kernels.axpy_accumulate(a, d, scale),
                acc,
                hv_m,
            )
        else:
            acc = jax.tree.map(lambda a, d: a + scale * d, acc, hv_m)
        return acc, None

    acc0 = tree_zeros_like(v)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(num_micro))
    return acc


def grad_microbatched(loss_fn: LossFn, params, batch, num_micro: int):
    """Gradient accumulated over micro-batches (same exactness
    conditions as :func:`hvp_microbatched`)."""
    from optwboundeigenval_tpu.utils.tree import tree_zeros_like

    slice_i, _ = _micro_slices(batch, num_micro)
    w_total = _batch_weight(batch)

    def body(acc, i):
        mbatch = slice_i(i)
        scale = _batch_weight(mbatch) / jnp.maximum(w_total, 1e-12)
        g = jax.grad(loss_fn)(params, mbatch)
        return jax.tree.map(lambda a, d: a + scale * d, acc, g), None

    acc, _ = jax.lax.scan(
        body, tree_zeros_like(params), jnp.arange(num_micro)
    )
    return acc


def vghv_microbatched(loss_fn: LossFn, params, batch, v, num_micro: int):
    """``v^T (grad H) v`` accumulated over micro-batches.

    The third-order reverse pass is the MOST memory-hungry pass in the
    spectral step (reverse over forward-over-reverse holds the largest
    residual set), so the ``hvp_micro`` memory bound must hold here too,
    not just for the gradient and power-iteration HVPs.  For weighted-
    mean losses ``H = sum_m scale_m H_m`` with
    ``scale_m = sum(w_m)/sum(w)``, so the micro vGHv terms sum exactly
    to the full-batch one — same exactness argument as
    :func:`hvp_microbatched`.  Reference surface: ``HVPOperator.vGHv``
    (opt.py:110-152), whose memory the reference bounds only by capping
    the batch itself.
    """
    from optwboundeigenval_tpu.utils.tree import tree_zeros_like

    slice_i, _ = _micro_slices(batch, num_micro)
    w_total = _batch_weight(batch)

    def body(acc, i):
        mbatch = slice_i(i)
        scale = _batch_weight(mbatch) / jnp.maximum(w_total, 1e-12)

        def rayleigh_num(p):
            g = lambda q: jax.grad(loss_fn)(q, mbatch)
            hv = jax.jvp(g, (p,), (v,))[1]
            return tree_vdot(hv, v)

        gr = jax.grad(rayleigh_num)(params)
        return jax.tree.map(lambda a, d: a + scale * d, acc, gr), None

    acc, _ = jax.lax.scan(
        body, tree_zeros_like(params), jnp.arange(num_micro)
    )
    return acc


def loss_grad_hvp_vghv(loss_fn: LossFn, params, batch, v):
    """Fused convenience: returns ``(loss, grad, hvp_fn, vghv)`` for one
    batch.  Used by tests; the trainer composes the pieces itself so the
    ``vghv`` reverse pass only runs when the penalty is active
    (reference gates on ``g > 0``, opt.py:631-636)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    _, hvp_fn = linearize_hvp(loss_fn, params, batch)
    gv = vghv(loss_fn, params, batch, v)
    return loss, grads, hvp_fn, gv
