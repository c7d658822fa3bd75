"""Fused CNN HVP kernel vs the autodiff HVP (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.models import CNNUSPS
from optwboundeigenval_tpu.ops import curvature, fused_cnn_hvp
from optwboundeigenval_tpu.train import Task
from optwboundeigenval_tpu.utils.tree import tree_ravel, tree_random_like


def make_problem(batch_size=16, seed=0):
    task = Task(model=CNNUSPS())
    rng = np.random.default_rng(seed)
    batch = {
        "x": jnp.asarray(rng.normal(size=(batch_size, 16, 16, 1))
                         .astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 10, batch_size).astype(np.int32)),
        "w": jnp.ones(batch_size, jnp.float32),
    }
    params, _ = task.init(jax.random.PRNGKey(seed), batch["x"])

    def loss_fn(p, b):
        out = task.model.apply({"params": p}, b["x"], train=True)
        return task.loss(out, b["y"], b["w"])

    return task, params, batch, loss_fn


def test_fused_hvp_matches_autodiff():
    task, params, batch, loss_fn = make_problem()
    _, ref_hvp = curvature.linearize_hvp(loss_fn, params, batch)
    fused = fused_cnn_hvp.make_fused_hvp(params, batch)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        v = tree_random_like(jax.random.fold_in(key, i), params)
        a, _ = tree_ravel(ref_hvp(v))
        b, _ = tree_ravel(fused(v))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
        )


def test_fused_hvp_with_padded_weights():
    task, params, batch, _ = make_problem()
    w = np.ones(16, np.float32)
    w[12:] = 0.0
    batch = dict(batch, w=jnp.asarray(w))

    def loss_fn(p, b):
        out = task.model.apply({"params": p}, b["x"], train=True)
        return task.loss(out, b["y"], b["w"])

    _, ref_hvp = curvature.linearize_hvp(loss_fn, params, batch)
    fused = fused_cnn_hvp.make_fused_hvp(params, batch)
    v = tree_random_like(jax.random.PRNGKey(3), params)
    a, _ = tree_ravel(ref_hvp(v))
    b, _ = tree_ravel(fused(v))
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6
    )


def test_fused_hvp_jits_and_scans():
    task, params, batch, _ = make_problem()

    @jax.jit
    def run(params, batch, v):
        fused = fused_cnn_hvp.make_fused_hvp(params, batch)

        def body(v, _):
            hv = fused(v)
            n = jnp.sqrt(sum(jnp.vdot(x, x)
                             for x in jax.tree_util.tree_leaves(hv)))
            return jax.tree.map(lambda x: x / n, hv), n

        return jax.lax.scan(body, v, None, length=4)[1]

    v0 = tree_random_like(jax.random.PRNGKey(0), params)
    norms = np.asarray(run(params, batch, v0))
    assert np.all(np.isfinite(norms))
