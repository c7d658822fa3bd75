"""Oracle tests for the curvature kernel.

The reference validates its R-op/R²-op against MATLAB symbolic
derivatives of a tiny 2-layer sigmoid/MSE network (hessTest.m:24-65,
hessTest.py:7-14, rop.py:170-234).  Here the oracle is in-repo:
``jax.hessian`` gives the exact dense Hessian of the same toy model and
finite differences validate the third-order term.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optwboundeigenval_tpu.ops import curvature
from optwboundeigenval_tpu.utils.tree import (
    tree_axpy,
    tree_ravel,
    tree_random_like,
    tree_vdot,
)


def toy_loss(params, batch):
    """2-layer sigmoid MLP + MSE — same shape of problem as hessTest.m."""
    x, y = batch
    h = jax.nn.sigmoid(x @ params["w1"] + params["b1"])
    out = jax.nn.sigmoid(h @ params["w2"] + params["b2"])
    return jnp.mean((out - y) ** 2)


@pytest.fixture
def toy_problem():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    params = {
        "w1": jax.random.normal(k1, (5, 4), jnp.float64),
        "b1": jax.random.normal(k2, (4,), jnp.float64),
        "w2": jax.random.normal(k3, (4, 3), jnp.float64),
        "b2": jax.random.normal(k4, (3,), jnp.float64),
    }
    batch = (
        jax.random.normal(k5, (7, 5), jnp.float64),
        jax.random.uniform(k6, (7, 3), jnp.float64),
    )
    return params, batch


def dense_hessian(params, batch):
    flat, unravel = tree_ravel(params)
    f = lambda p: toy_loss(unravel(p), batch)
    return jax.hessian(f)(flat), flat, unravel, f


def test_grad_matches_finite_difference(toy_problem):
    params, batch = toy_problem
    g = curvature.grad(toy_loss, params, batch)
    gflat, _ = tree_ravel(g)
    flat, unravel = tree_ravel(params)
    f = lambda p: toy_loss(unravel(p), batch)
    eps = 1e-6
    for i in range(0, flat.size, 7):
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = (f(flat + e) - f(flat - e)) / (2 * eps)
        assert abs(fd - gflat[i]) < 1e-6


def test_hvp_matches_dense_hessian(toy_problem):
    params, batch = toy_problem
    H, flat, unravel, _ = dense_hessian(params, batch)
    v = tree_random_like(jax.random.PRNGKey(1), params)
    hv = curvature.hvp(toy_loss, params, batch, v)
    hv_flat, _ = tree_ravel(hv)
    v_flat, _ = tree_ravel(v)
    np.testing.assert_allclose(hv_flat, H @ v_flat, rtol=1e-9, atol=1e-12)


def test_linearize_hvp_matches_oneshot_and_returns_grad(toy_problem):
    params, batch = toy_problem
    grads, hvp_fn = curvature.linearize_hvp(toy_loss, params, batch)
    g_direct = curvature.grad(toy_loss, params, batch)
    gf, _ = tree_ravel(grads)
    gd, _ = tree_ravel(g_direct)
    np.testing.assert_allclose(gf, gd, rtol=1e-12)
    # Repeated products against the one linearization (stored_grad reuse,
    # opt.py:86-91) agree with one-shot HVPs.
    key = jax.random.PRNGKey(2)
    for i in range(3):
        v = tree_random_like(jax.random.fold_in(key, i), params)
        a, _ = tree_ravel(hvp_fn(v))
        b, _ = tree_ravel(curvature.hvp(toy_loss, params, batch, v))
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def test_vghv_matches_finite_difference_of_rayleigh(toy_problem):
    """v^T (grad H) v == d/dp [v^T H(p) v] — validated by central
    differences of the Rayleigh numerator (reference oracle: rop.py
    R²-op vs hessTest.m third-order tensor)."""
    params, batch = toy_problem
    v = tree_random_like(jax.random.PRNGKey(3), params)
    gv = curvature.vghv(toy_loss, params, batch, v)
    gv_flat, _ = tree_ravel(gv)

    flat, unravel = tree_ravel(params)
    v_flat, _ = tree_ravel(v)

    def rayleigh(p):
        H, _, _, _ = dense_hessian(unravel(p), batch)
        return v_flat @ H @ v_flat

    eps = 1e-5
    for i in range(0, flat.size, 11):
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = (rayleigh(flat + e) - rayleigh(flat - e)) / (2 * eps)
        assert abs(fd - gv_flat[i]) < 1e-5, f"component {i}"


def test_hvp_is_jittable_and_symmetric(toy_problem):
    params, batch = toy_problem
    H, _, _, _ = dense_hessian(params, batch)
    np.testing.assert_allclose(H, H.T, rtol=1e-10, atol=1e-12)
    jitted = jax.jit(lambda p, b, v: curvature.hvp(toy_loss, p, b, v))
    v = tree_random_like(jax.random.PRNGKey(4), params)
    a, _ = tree_ravel(jitted(params, batch, v))
    b, _ = tree_ravel(curvature.hvp(toy_loss, params, batch, v))
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_fused_helper(toy_problem):
    params, batch = toy_problem
    v = tree_random_like(jax.random.PRNGKey(5), params)
    loss, grads, hvp_fn, gv = curvature.loss_grad_hvp_vghv(
        toy_loss, params, batch, v
    )
    assert jnp.isfinite(loss)
    hv = hvp_fn(v)
    # <Hv, v> equals the Rayleigh numerator computed densely.
    H, flat, unravel, _ = dense_hessian(params, batch)
    v_flat, _ = tree_ravel(v)
    np.testing.assert_allclose(
        tree_vdot(hv, v), v_flat @ H @ v_flat, rtol=1e-9
    )
