"""Analytic curvature-kernel oracle — the reference's hessTest.

The reference validates its hand-rolled R-op/R²-op against MATLAB
symbolic derivatives of a tiny 2-layer sigmoid/MSE network
(hessTest.m:24-65 generates exact grad/Hv/vGHv; hessTest.py:7-14 prints
norm differences; rop.py implements the hand derivation).

Here the oracle is in-repo and exact without MATLAB: ``jax.hessian``
gives the dense Hessian of the same toy model in float64, and the
third-order term is cross-checked by central differences of the
Rayleigh numerator.  Pass criterion is the same: norm differences near
machine epsilon.

Run: ``python hess_test.py``
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.ops import curvature
from optwboundeigenval_tpu.utils.tree import (
    tree_ravel,
    tree_random_like,
)


def toy_loss(params, batch):
    x, y = batch
    h = jax.nn.sigmoid(x @ params["w1"] + params["b1"])
    out = jax.nn.sigmoid(h @ params["w2"] + params["b2"])
    return jnp.mean((out - y) ** 2)


def main():
    key = jax.random.PRNGKey(1226)
    ks = jax.random.split(key, 7)
    params = {
        "w1": jax.random.normal(ks[0], (5, 4), jnp.float64),
        "b1": jax.random.normal(ks[1], (4,), jnp.float64),
        "w2": jax.random.normal(ks[2], (4, 3), jnp.float64),
        "b2": jax.random.normal(ks[3], (3,), jnp.float64),
    }
    batch = (
        jax.random.normal(ks[4], (7, 5), jnp.float64),
        jax.random.uniform(ks[5], (7, 3), jnp.float64),
    )
    v = tree_random_like(ks[6], params)
    flat, unravel = tree_ravel(params)
    v_flat, _ = tree_ravel(v)

    f = lambda p: toy_loss(unravel(p), batch)

    # exact oracle
    g_exact = jax.grad(f)(flat)
    H = jax.hessian(f)(flat)
    hv_exact = H @ v_flat

    # kernel under test
    g_ours, _ = tree_ravel(curvature.grad(toy_loss, params, batch))
    hv_ours, _ = tree_ravel(curvature.hvp(toy_loss, params, batch, v))
    vghv_ours, _ = tree_ravel(curvature.vghv(toy_loss, params, batch, v))

    # third-order oracle: central differences of v^T H(p) v
    def rayleigh(p):
        return v_flat @ jax.hessian(f)(p) @ v_flat

    eps = 1e-6
    vghv_fd = np.array(
        [
            (
                rayleigh(flat.at[i].add(eps)) - rayleigh(flat.at[i].add(-eps))
            )
            / (2 * eps)
            for i in range(flat.size)
        ]
    )

    d_grad = float(jnp.linalg.norm(g_ours - g_exact))
    d_hv = float(jnp.linalg.norm(hv_ours - hv_exact))
    d_vghv = float(np.linalg.norm(np.asarray(vghv_ours) - vghv_fd))
    print(f"grad diff:  {d_grad:.3e}")
    print(f"R-op diff:  {d_hv:.3e}")
    print(f"R2-op diff: {d_vghv:.3e}")
    assert d_grad < 1e-12, "gradient mismatch"
    assert d_hv < 1e-12, "Hv mismatch"
    assert d_vghv < 1e-6, "vGHv mismatch (finite-difference tolerance)"
    print("PASS")


if __name__ == "__main__":
    main()
