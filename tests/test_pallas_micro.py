"""Pallas kernels + micro-batched HVP tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.ops import curvature, eigen, pallas_kernels as pk
from optwboundeigenval_tpu.utils.tree import tree_ravel, tree_uniform_like


def test_axpy_accumulate_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1000,)).astype(np.float32)
    d = rng.normal(size=(1000,)).astype(np.float32)
    out = np.asarray(pk.axpy_accumulate(jnp.asarray(a), jnp.asarray(d), 0.3))
    np.testing.assert_allclose(out, a + 0.3 * d, rtol=1e-5, atol=1e-6)
    # non-flat shapes
    a2 = rng.normal(size=(7, 13)).astype(np.float32)
    d2 = rng.normal(size=(7, 13)).astype(np.float32)
    out2 = np.asarray(pk.axpy_accumulate(jnp.asarray(a2), jnp.asarray(d2)))
    np.testing.assert_allclose(out2, a2 + d2, rtol=1e-6)


def test_hvp_microbatched_exact():
    """Micro-batched accumulation equals the full-batch HVP for
    weighted-mean losses, including padded zero-weight rows."""

    def loss(params, batch):
        x, y, w = batch["x"], batch["y"], batch["w"]
        h = jnp.tanh(x @ params["w1"])
        out = h @ params["w2"]
        per = jnp.mean((out - y) ** 2, axis=1)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)

    key = jax.random.PRNGKey(0)
    params = {
        "w1": jax.random.normal(key, (6, 5)) * 0.5,
        "w2": jax.random.normal(jax.random.fold_in(key, 1), (5, 3)) * 0.5,
    }
    w = jnp.concatenate([jnp.ones(12), jnp.zeros(4)])  # padded rows
    batch = {
        "x": jax.random.normal(jax.random.fold_in(key, 2), (16, 6)),
        "y": jax.random.normal(jax.random.fold_in(key, 3), (16, 3)),
        "w": w,
    }
    v = tree_uniform_like(params)
    full = curvature.hvp(loss, params, batch, v)
    for num_micro in (2, 4):
        for use_pallas in (True, False):
            micro = curvature.hvp_microbatched(
                loss, params, batch, v, num_micro, use_pallas=use_pallas
            )
            a, _ = tree_ravel(full)
            b, _ = tree_ravel(micro)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )


def test_grad_microbatched_exact():
    def loss(params, batch):
        x, y, w = batch["x"], batch["y"], batch["w"]
        out = x @ params["w1"]
        per = jnp.mean((out - y) ** 2, axis=1)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)

    key = jax.random.PRNGKey(1)
    params = {"w1": jax.random.normal(key, (4, 3))}
    batch = {
        "x": jax.random.normal(jax.random.fold_in(key, 1), (8, 4)),
        "y": jax.random.normal(jax.random.fold_in(key, 2), (8, 3)),
        "w": jnp.ones(8),
    }
    full = jax.grad(loss)(params, batch)
    micro = curvature.grad_microbatched(loss, params, batch, 4)
    a, _ = tree_ravel(full)
    b, _ = tree_ravel(micro)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_vghv_microbatched_exact():
    """The third-order pass micro-batches exactly too (ADVICE r1: the
    hvp_micro memory bound must hold on the vGHv pass, spectral.py
    routes through this when hvp_micro > 1)."""

    def loss(params, batch):
        x, y, w = batch["x"], batch["y"], batch["w"]
        h = jnp.tanh(x @ params["w1"])
        out = h @ params["w2"]
        per = jnp.mean((out - y) ** 2, axis=1)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)

    key = jax.random.PRNGKey(7)
    params = {
        "w1": jax.random.normal(key, (6, 5)) * 0.5,
        "w2": jax.random.normal(jax.random.fold_in(key, 1), (5, 3)) * 0.5,
    }
    w = jnp.concatenate([jnp.ones(12), jnp.zeros(4)])  # padded rows
    batch = {
        "x": jax.random.normal(jax.random.fold_in(key, 2), (16, 6)),
        "y": jax.random.normal(jax.random.fold_in(key, 3), (16, 3)),
        "w": w,
    }
    v = tree_uniform_like(params)
    full = curvature.vghv(loss, params, batch, v)
    for num_micro in (2, 4):
        micro = curvature.vghv_microbatched(loss, params, batch, v, num_micro)
        a, _ = tree_ravel(full)
        b, _ = tree_ravel(micro)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_penalty_and_grad_micro_matches_full():
    """penalty_and_grad(num_micro=4) == penalty_and_grad(num_micro=1)
    in the active regime (g > 0)."""
    from optwboundeigenval_tpu.ops import spectral

    def loss(params, batch):
        x, y, w = batch["x"], batch["y"], batch["w"]
        out = jnp.tanh(x @ params["w1"]) @ params["w2"]
        per = jnp.mean((out - y) ** 2, axis=1)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)

    key = jax.random.PRNGKey(11)
    params = {
        "w1": jax.random.normal(key, (6, 5)) * 0.5,
        "w2": jax.random.normal(jax.random.fold_in(key, 1), (5, 3)) * 0.5,
    }
    batch = {
        "x": jax.random.normal(jax.random.fold_in(key, 2), (16, 6)),
        "y": jax.random.normal(jax.random.fold_in(key, 3), (16, 3)),
        "w": jnp.ones(16),
    }
    v = tree_uniform_like(params)
    rho = jnp.asarray(5.0)  # force g > 0 with K=1
    full = spectral.penalty_and_grad(loss, params, batch, v, rho, K=1.0)
    micro = spectral.penalty_and_grad(
        loss, params, batch, v, rho, K=1.0, num_micro=4
    )
    assert float(full.g) > 0
    a, _ = tree_ravel(full.grad_g)
    b, _ = tree_ravel(micro.grad_g)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
    )
