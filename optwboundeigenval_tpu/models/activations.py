"""Dispatchable activations.

The reference's GuidedBackprop swaps every ReLU's backward pass via
torch module hooks (guided_backprop.py:8-75).  JAX has no hooks; the
equivalent is an activation function whose VJP is selected by a
trace-time context flag: models in this package call
:func:`relu`, and :func:`guided` switches it to the guided variant
(backward clamps both negative inputs AND negative upstream gradients)
for the duration of a trace.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

_GUIDED = contextvars.ContextVar("guided_relu", default=False)


@jax.custom_vjp
def guided_relu(x):
    return jnp.maximum(x, 0)


def _guided_fwd(x):
    return jnp.maximum(x, 0), x


def _guided_bwd(x, g):
    # clamp negative upstream grads and grads at negative inputs
    # (guided_backprop.py relu_backward_hook_function)
    return (jnp.where((x > 0) & (g > 0), g, 0.0),)


guided_relu.defvjp(_guided_fwd, _guided_bwd)


def relu(x):
    """nn.relu with a guided-backprop switchable VJP (trace-time flag)."""
    if _GUIDED.get():
        return guided_relu(x)
    return jax.nn.relu(x)


@contextlib.contextmanager
def guided():
    """Trace functions under this context to get guided-ReLU gradients."""
    token = _GUIDED.set(True)
    try:
        yield
    finally:
        _GUIDED.reset(token)
