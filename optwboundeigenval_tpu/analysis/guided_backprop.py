"""Guided backpropagation saliency.

Capability parity with reference ``GuidedBackprop``
(guided_backprop.py:8-75): gradients of the target-class score w.r.t.
the input, with every ReLU's backward clamping negative upstream
gradients and gradients at negative activations.

TPU-native: the ReLU swap is a trace-time context
(models/activations.py); the gradient is one jitted ``jax.grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optwboundeigenval_tpu.models import activations


def generate_gradients(task, params, model_state, x, target_class=None):
    """Guided gradients for a batch: (B, ...) input-shaped array.
    ``target_class`` int or per-example array; defaults to argmax."""

    preds = jnp.argmax(task.predict(params, model_state, {"x": x}), axis=-1)
    if target_class is None:
        cls = preds
    else:
        cls = jnp.broadcast_to(jnp.asarray(target_class), preds.shape)

    with activations.guided():

        def score(xi, c):
            out = task.predict(params, model_state, {"x": xi[None]})[0]
            return out[c]

        grad_fn = jax.vmap(jax.grad(score), in_axes=(0, 0))
        # trace happens inside the context, so the guided VJP is baked in
        grads = jax.jit(grad_fn)(x, cls)
    return grads
