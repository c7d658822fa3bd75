"""Power-iteration tests on operators with known spectra, plus parity
checks of the reference's stopping/discard semantics (opt.py:418-533).

Test matrices use spectra with a clear dominant gap so the power method
converges within the reference's ``min(ndim, max_pow_iter)`` iteration
budget (opt.py:447)."""

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.ops import curvature, eigen
from optwboundeigenval_tpu.utils.tree import tree_ravel, tree_uniform_like


def matvec_from_matrix(A):
    return lambda v: {"x": A @ v["x"]}


def gapped_matrix(n, dominant, rest_max, seed):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.concatenate([[dominant], np.linspace(0.05, rest_max, n - 1)])
    return jnp.asarray(Q @ np.diag(eigs) @ Q.T)


def test_converges_on_known_spectrum():
    A = gapped_matrix(32, dominant=5.0, rest_max=2.0, seed=0)
    v0 = tree_uniform_like({"x": jnp.zeros(32)})
    res = eigen.estimate_dominant_eig(
        matvec_from_matrix(A), v0, eps=1e-6, max_iter=1000
    )
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.rho), 5.0, rtol=1e-3)


def test_negative_dominant_eigenvalue_sign_flip():
    """Reference flips sign so rho tracks |lambda| (opt.py:458-460)."""
    A = gapped_matrix(16, dominant=-6.0, rest_max=2.0, seed=1)
    rng = np.random.default_rng(1)
    v = rng.normal(size=16)
    v0 = {"x": jnp.asarray(v / np.linalg.norm(v))}
    res = eigen.estimate_dominant_eig(
        matvec_from_matrix(A), v0, eps=1e-6, max_iter=1000
    )
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.rho), 6.0, rtol=1e-3)


def test_iteration_budget_is_capped_by_dim():
    """Reference budget: min(ndim, max_pow_iter) HVPs (opt.py:447)."""
    A = gapped_matrix(8, dominant=3.0, rest_max=2.9, seed=7)
    v0 = tree_uniform_like({"x": jnp.zeros(8)})
    res = eigen.power_iteration(
        matvec_from_matrix(A), v0, eps=1e-30, max_iter=1000
    )
    assert int(res.iters) <= 8
    res2 = eigen.power_iteration(
        matvec_from_matrix(A), v0, eps=1e-12, max_iter=1000, cap_by_dim=False
    )
    assert int(res2.iters) > 8


def test_discard_protocol_on_nonconvergence():
    """With too few iterations allowed, ignore_bad_vals gives rho = -1
    and resets v to the uniform vector (opt.py:513-520)."""
    A = gapped_matrix(24, dominant=4.0, rest_max=3.9, seed=2)
    rng = np.random.default_rng(2)
    v0 = {"x": jnp.asarray(rng.normal(size=24))}
    res = eigen.estimate_dominant_eig(
        matvec_from_matrix(A), v0, eps=1e-12, max_iter=2, ignore_bad_vals=True
    )
    assert not bool(res.converged)
    assert float(res.rho) == -1.0
    uniform = tree_uniform_like(v0)
    np.testing.assert_allclose(res.v["x"], uniform["x"])
    # without the flag the (bad) estimate is kept
    res2 = eigen.estimate_dominant_eig(
        matvec_from_matrix(A), v0, eps=1e-12, max_iter=2, ignore_bad_vals=False
    )
    assert float(res2.rho) != -1.0


def test_warm_start_converges_no_slower():
    A = gapped_matrix(48, dominant=3.0, rest_max=1.0, seed=3)
    mv = matvec_from_matrix(A)
    cold = eigen.power_iteration(
        mv, tree_uniform_like({"x": jnp.zeros(48)}), eps=1e-6, max_iter=1000
    )
    assert bool(cold.converged)
    warm = eigen.power_iteration(mv, cold.v, eps=1e-6, max_iter=1000)
    assert int(warm.iters) <= int(cold.iters)


def test_alpha_schedule_callable():
    """pow_iter_alpha may be a callable of the iteration index
    (opt.py:489, params/forest_lobpcg.py alpha(k)=exp(-4k-2))."""
    A = gapped_matrix(16, dominant=3.0, rest_max=1.0, seed=4)
    alpha = lambda i: 1.0 / (1.0 + i.astype(jnp.float32))
    res = eigen.power_iteration(
        matvec_from_matrix(A),
        tree_uniform_like({"x": jnp.zeros(16)}),
        eps=1e-6,
        max_iter=1000,
        alpha=alpha,
    )
    assert jnp.isfinite(res.rho)


def test_preconditioned_exact_inverse():
    """With P = A^{-1} the preconditioned residual iteration stays a
    fixed-point iteration for the dominant eigenvector; sanity check of
    the LOBPCG plumbing (opt.py:491-493)."""
    rng = np.random.default_rng(5)
    Q, _ = np.linalg.qr(rng.normal(size=(20, 20)))
    eigs = np.concatenate([[8.0], np.linspace(0.5, 2.0, 19)])
    A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
    Ainv = jnp.asarray(Q @ np.diag(1.0 / eigs) @ Q.T)
    # Damping must satisfy |1 + alpha*(1 - lam/e_min)| < 1 for the
    # smallest eigencomponent to contract: alpha < 2/(lam/e_min - 1).
    res = eigen.power_iteration(
        matvec_from_matrix(A),
        tree_uniform_like({"x": jnp.zeros(20)}),
        eps=1e-5,
        max_iter=500,
        alpha=0.05,
        precond=matvec_from_matrix(Ainv),
        cap_by_dim=False,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.rho), 8.0, rtol=5e-2)


def test_on_neural_hessian():
    """End-to-end: dominant Hessian eigenvalue of a tiny MLP matches the
    dense eigendecomposition (the real comp_rho use case)."""

    def loss(params, batch):
        x, y = batch
        h = jnp.tanh(x @ params["w1"])
        out = h @ params["w2"]
        return jnp.mean((out - y) ** 2)

    key = jax.random.PRNGKey(0)
    params = {
        "w1": jax.random.normal(key, (6, 5), jnp.float64) * 0.5,
        "w2": jax.random.normal(jax.random.fold_in(key, 1), (5, 2), jnp.float64)
        * 0.5,
    }
    batch = (
        jax.random.normal(jax.random.fold_in(key, 2), (16, 6), jnp.float64),
        jax.random.normal(jax.random.fold_in(key, 3), (16, 2), jnp.float64),
    )
    flat, unravel = tree_ravel(params)
    H = jax.hessian(lambda p: loss(unravel(p), batch))(flat)
    true_rho = float(np.max(np.abs(np.linalg.eigvalsh(H))))

    _, hvp_fn = curvature.linearize_hvp(loss, params, batch)
    res = eigen.estimate_dominant_eig(
        hvp_fn,
        tree_uniform_like(params),
        eps=1e-9,
        max_iter=20000,
        cap_by_dim=False,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.rho), true_rho, rtol=1e-3)


def test_subspace_iteration_topk():
    """Top-k block power iteration recovers the k dominant eigenvalues
    (by magnitude), including a negative one."""
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.normal(size=(40, 40)))
    eigs = np.concatenate([[7.0, -5.0, 3.0], np.linspace(0.05, 1.0, 37)])
    A = jnp.asarray((Q @ np.diag(eigs) @ Q.T).astype(np.float32))
    v0 = {"x": jnp.full((40,), 1.0 / np.sqrt(40), jnp.float32)}
    res = eigen.subspace_iteration(
        matvec_from_matrix(A), v0, k=3, eps=1e-5, max_iter=500
    )
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), [7.0, -5.0, 3.0], rtol=1e-3
    )
    # Ritz basis is orthonormal
    G = np.asarray(res.V @ res.V.T)
    np.testing.assert_allclose(G, np.eye(3), atol=1e-4)


def test_subspace_iteration_on_hessian():
    """Top-k of a neural Hessian matches the dense spectrum."""

    def loss(params, batch):
        x, y = batch
        h = jnp.tanh(x @ params["w1"])
        return jnp.mean((h @ params["w2"] - y) ** 2)

    key = jax.random.PRNGKey(0)
    params = {
        "w1": jax.random.normal(key, (5, 4), jnp.float64) * 0.7,
        "w2": jax.random.normal(jax.random.fold_in(key, 1), (4, 2),
                                jnp.float64) * 0.7,
    }
    batch = (
        jax.random.normal(jax.random.fold_in(key, 2), (12, 5), jnp.float64),
        jax.random.normal(jax.random.fold_in(key, 3), (12, 2), jnp.float64),
    )
    flat, unravel = tree_ravel(params)
    H = jax.hessian(lambda p: loss(unravel(p), batch))(flat)
    dense = np.linalg.eigvalsh(np.asarray(H))
    top3 = dense[np.argsort(-np.abs(dense))][:3]

    _, hvp_fn = curvature.linearize_hvp(loss, params, batch)
    res = eigen.subspace_iteration(
        hvp_fn, tree_uniform_like(params), k=3, eps=1e-8, max_iter=3000
    )
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), top3, rtol=1e-3
    )


def test_jittable_whole_solve():
    A = gapped_matrix(16, dominant=3.0, rest_max=1.0, seed=6)

    @jax.jit
    def solve(A, v0):
        return eigen.power_iteration(
            lambda v: {"x": A @ v["x"]}, v0, eps=1e-6, max_iter=1000
        )

    res = solve(A, tree_uniform_like({"x": jnp.zeros(16)}))
    np.testing.assert_allclose(float(res.rho), 3.0, rtol=1e-3)


def test_randomized_oracle_sweep():
    """Seeded randomized hardening sweep: dominant-eigenvalue estimates
    must match numpy's dense eigendecomposition across operator shapes
    the handcrafted cases don't cover — varying size, spectral-gap
    ratio, sign and scale of the dominant eigenvalue, and indefinite
    spectra (curvature operators are indefinite early in training)."""
    rng = np.random.default_rng(1226)
    cases = []
    for size in (8, 24, 64):
        for gap in (0.2, 0.6, 0.85):
            for sign in (1.0, -1.0):
                for scale in (1e-2, 1.0, 1e3):
                    cases.append((size, gap, sign, scale))
    for i, (size, gap, sign, scale) in enumerate(cases):
        Q, _ = np.linalg.qr(rng.normal(size=(size, size)))
        # indefinite bulk in [-gap, gap] * dominant, dominant separated
        bulk = rng.uniform(-gap, gap, size=size - 1)
        eigs = np.concatenate([[sign], bulk]) * scale
        A = jnp.asarray(Q @ np.diag(eigs) @ Q.T, jnp.float64)
        v0 = tree_uniform_like({"x": jnp.zeros(size, jnp.float64)})
        res = eigen.estimate_dominant_eig(
            matvec_from_matrix(A), v0, eps=1e-7, max_iter=5000,
            cap_by_dim=False,
        )
        expected = np.abs(np.linalg.eigvalsh(np.asarray(A))).max()
        assert bool(res.converged), (size, gap, sign, scale)
        np.testing.assert_allclose(
            float(res.rho), expected, rtol=1e-4,
            err_msg=f"case {i}: size={size} gap={gap} "
                    f"sign={sign} scale={scale}",
        )


def test_randomized_subspace_topk_oracle():
    """subspace_iteration's top-k Ritz values match numpy's k largest
    |eigenvalues| on random symmetric operators with clustered tails."""
    rng = np.random.default_rng(7)
    for size, k in ((16, 2), (40, 4), (64, 3)):
        Q, _ = np.linalg.qr(rng.normal(size=(size, size)))
        top = np.linspace(3.0, 2.0, k) * np.sign(rng.normal(size=k))
        tail = rng.uniform(-0.8, 0.8, size=size - k)
        eigs = np.concatenate([top, tail])
        A = jnp.asarray(Q @ np.diag(eigs) @ Q.T, jnp.float64)
        v0 = tree_uniform_like({"x": jnp.zeros(size, jnp.float64)})
        res = eigen.subspace_iteration(
            matvec_from_matrix(A), v0, k=k, eps=1e-9, max_iter=3000,
        )
        expected = np.sort(np.abs(eigs))[::-1][:k]
        got = np.sort(np.abs(np.asarray(res.eigenvalues)))[::-1]
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_momentum_acceleration_matches_oracle_with_fewer_hvps():
    """Heavy-ball accelerated power iteration (momentum=0.9): same rho
    as numpy's dense eigendecomposition, with FEWER HVPs than plain
    power iteration in the small-spectral-gap regime (the production
    case), for positive AND negative dominant eigenvalues."""
    rng = np.random.default_rng(42)
    for sign in (1.0, -1.0):
        size = 64
        Q, _ = np.linalg.qr(rng.normal(size=(size, size)))
        bulk = rng.uniform(-0.95, 0.95, size=size - 1)
        eigs = np.concatenate([[sign], bulk])
        A = jnp.asarray(Q @ np.diag(eigs) @ Q.T, jnp.float64)
        v0 = tree_uniform_like({"x": jnp.zeros(size, jnp.float64)})
        expected = np.abs(eigs).max()
        plain = eigen.estimate_dominant_eig(
            matvec_from_matrix(A), v0, eps=1e-7, max_iter=20000,
            cap_by_dim=False,
        )
        mom = eigen.estimate_dominant_eig(
            matvec_from_matrix(A), v0, eps=1e-7, max_iter=20000,
            cap_by_dim=False, momentum=0.9,
        )
        assert bool(mom.converged)
        np.testing.assert_allclose(float(mom.rho), expected, rtol=1e-5)
        assert int(mom.iters) < int(plain.iters), (
            sign, int(mom.iters), int(plain.iters))
        # the eigenvector estimate is real too: residual small (rho's
        # Rayleigh error is quadratic in this, hence the looser bound)
        assert float(mom.norm) < 1e-2


def test_momentum_rejects_preconditioner():
    v0 = tree_uniform_like({"x": jnp.zeros(8)})
    import pytest

    with pytest.raises(ValueError):
        eigen.power_iteration(
            matvec_from_matrix(jnp.eye(8)), v0,
            momentum=0.9, precond=lambda r: r,
        )


# ---------------------------------------------------------------------------
# Lanczos eigensolve (capability upgrade; ops/eigen.py lanczos_dominant)


def test_lanczos_matches_oracle_on_known_spectrum():
    A = gapped_matrix(64, dominant=5.0, rest_max=2.0, seed=3)
    v0 = tree_uniform_like({"x": jnp.zeros(64)})
    res = eigen.lanczos_dominant(matvec_from_matrix(A), v0, m=16, eps=1e-5)
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.rho), 5.0, rtol=1e-6)
    # returned Ritz vector is the dominant eigenvector: Av = lam v
    av = A @ res.v["x"]
    lam = float(res.rho) * np.sign(float(res.v["x"] @ av))
    np.testing.assert_allclose(np.asarray(av), lam * np.asarray(res.v["x"]),
                               atol=1e-4)


def test_lanczos_beats_power_in_small_gap_regime():
    """The design point: at an equal HVP budget and a tiny spectral gap
    (|λ2/λ1| = 0.99), Lanczos nails ρ while power iteration is far off."""
    rng = np.random.default_rng(7)
    n = 200
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.concatenate([[-3.0, 2.97], rng.uniform(-2.5, 2.5, n - 2)])
    A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
    v0 = tree_uniform_like({"x": jnp.zeros(n)})

    lz = eigen.lanczos_dominant(matvec_from_matrix(A), v0, m=16, eps=1e-2)
    assert int(lz.iters) == 17  # m HVPs + 1 explicit residual
    np.testing.assert_allclose(float(lz.rho), 3.0, rtol=1e-4)

    pw = eigen.power_iteration(
        matvec_from_matrix(A), v0, eps=1e-12, max_iter=17, cap_by_dim=False
    )
    # power is still mixing the ±(~3) pair at this budget (it may land
    # numerically near 3.0 by tracking |λ2| — still the wrong pair and
    # far less accurate); Lanczos is >50x closer at the same HVP count
    assert not bool(pw.converged)
    assert abs(float(pw.rho) - 3.0) > 50 * abs(float(lz.rho) - 3.0)


def test_lanczos_negative_dominant_and_breakdown():
    # negative dominant eigenvalue: rho is |λ1|
    A = gapped_matrix(32, dominant=-4.0, rest_max=1.5, seed=5)
    v0 = tree_uniform_like({"x": jnp.zeros(32)})
    res = eigen.lanczos_dominant(matvec_from_matrix(A), v0, m=12)
    np.testing.assert_allclose(float(res.rho), 4.0, rtol=1e-6)

    # exact breakdown: rank-1 operator, Krylov space invariant after
    # one step — remaining steps must stay finite and the pair exact
    u = np.asarray(tree_uniform_like({"x": jnp.zeros(32)})["x"])
    B = jnp.asarray(5.0 * np.outer(u, u))
    res2 = eigen.lanczos_dominant(matvec_from_matrix(B), v0, m=8)
    assert bool(jnp.isfinite(res2.v["x"]).all())
    np.testing.assert_allclose(float(res2.rho), 5.0, rtol=1e-6)
    assert bool(res2.converged)


def test_lanczos_on_neural_hessian_fewer_hvps():
    """comp_rho use case: tiny-MLP Hessian via linearize_hvp; m=24
    Lanczos HVPs reproduce the dense-eigendecomposition ρ."""

    def loss(params, batch):
        x, y = batch
        h = jnp.tanh(x @ params["w1"])
        out = h @ params["w2"]
        return jnp.mean((out - y) ** 2)

    key = jax.random.PRNGKey(4)
    params = {
        "w1": jax.random.normal(key, (6, 5), jnp.float64) * 0.5,
        "w2": jax.random.normal(jax.random.fold_in(key, 1), (5, 2), jnp.float64)
        * 0.5,
    }
    batch = (
        jax.random.normal(jax.random.fold_in(key, 2), (16, 6), jnp.float64),
        jax.random.normal(jax.random.fold_in(key, 3), (16, 2), jnp.float64),
    )
    flat, unravel = tree_ravel(params)
    H = jax.hessian(lambda p: loss(unravel(p), batch))(flat)
    true_rho = float(np.max(np.abs(np.linalg.eigvalsh(H))))

    _, hvp_fn = curvature.linearize_hvp(loss, params, batch)
    res = eigen.estimate_dominant_eig(
        hvp_fn, tree_uniform_like(params), eps=1e-6,
        method="lanczos", lanczos_m=24,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.rho), true_rho, rtol=1e-6)


def test_lanczos_discard_protocol_and_precond_rejection():
    A = gapped_matrix(48, dominant=5.0, rest_max=2.0, seed=9)
    v0 = tree_uniform_like({"x": jnp.zeros(48)})
    # m=2 cannot reach eps=1e-10: discard fires exactly like the power
    # path (rho = -1, eigenvector reset to the uniform vector)
    res = eigen.estimate_dominant_eig(
        matvec_from_matrix(A), v0, eps=1e-10,
        method="lanczos", lanczos_m=2,
    )
    assert float(res.rho) == -1.0
    np.testing.assert_allclose(
        np.asarray(res.v["x"]), np.asarray(v0["x"]), rtol=1e-6
    )

    import pytest

    with pytest.raises(ValueError):
        eigen.estimate_dominant_eig(
            matvec_from_matrix(A), v0, method="lanczos",
            precond=lambda r: r,
        )
    with pytest.raises(ValueError):
        eigen.estimate_dominant_eig(matvec_from_matrix(A), v0, method="nope")


def test_lanczos_jittable_and_randomized_oracle():
    rng = np.random.default_rng(11)
    solve = jax.jit(
        lambda A, v0: eigen.lanczos_dominant(
            matvec_from_matrix(A), v0, m=20, eps=1e-4
        )
    )
    for seed in range(4):
        r = np.random.default_rng(100 + seed)
        n = int(r.integers(24, 96))
        Q, _ = np.linalg.qr(r.normal(size=(n, n)))
        eigs = r.normal(size=n) * 3.0
        A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
        true_rho = float(np.max(np.abs(eigs)))
        v0 = tree_uniform_like({"x": jnp.zeros(n)})
        res = solve(A, v0)
        np.testing.assert_allclose(float(res.rho), true_rho, rtol=1e-3)


def test_lanczos_adaptive_early_exit_and_oracle():
    """lanczos_dominant_adaptive: correct rho on a known spectrum, and
    the while_loop actually exits early — a warm start (the converged
    eigenvector fed back, the trainer's cross-batch protocol) costs 2-3
    HVPs where the cold solve runs deeper."""
    rng = np.random.default_rng(21)
    n = 80
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.concatenate([[-6.0, 5.8], rng.uniform(-4, 4, n - 2)])
    A = jnp.asarray((Q @ np.diag(eigs) @ Q.T).astype(np.float32))
    v0 = tree_uniform_like({"x": jnp.zeros(n)})

    solve = jax.jit(
        lambda v: eigen.lanczos_dominant_adaptive(
            matvec_from_matrix(A), v, m_max=16, eps=1e-3
        )
    )
    cold = solve(v0)
    assert bool(cold.converged)
    np.testing.assert_allclose(float(cold.rho), 6.0, rtol=1e-3)
    warm = solve(cold.v)
    assert bool(warm.converged)
    np.testing.assert_allclose(float(warm.rho), 6.0, rtol=1e-3)
    assert int(warm.iters) <= 4 < int(cold.iters)

    # breakdown: rank-1 operator — invariant subspace after one step,
    # exits converged with the exact pair
    u = np.asarray(tree_uniform_like({"x": jnp.zeros(n)})["x"])
    B = jnp.asarray((5.0 * np.outer(u, u)).astype(np.float32))
    res2 = eigen.lanczos_dominant_adaptive(matvec_from_matrix(B), v0, m_max=8)
    assert bool(res2.converged) and bool(jnp.isfinite(res2.v["x"]).all())
    np.testing.assert_allclose(float(res2.rho), 5.0, rtol=1e-5)


def test_lanczos_adaptive_discard_protocol():
    """estimate_dominant_eig(method='lanczos_adaptive') keeps the
    reference discard protocol (opt.py:513-520): an unreachable eps at
    a tiny depth cap reports rho = -1 and resets the eigenvector."""
    A = gapped_matrix(48, dominant=5.0, rest_max=2.0, seed=9)
    v0 = tree_uniform_like({"x": jnp.zeros(48)})
    res = eigen.estimate_dominant_eig(
        matvec_from_matrix(A), v0, eps=1e-10,
        method="lanczos_adaptive", lanczos_m=2,
    )
    assert float(res.rho) == -1.0
    np.testing.assert_allclose(
        np.asarray(res.v["x"]), np.asarray(v0["x"]), rtol=1e-6
    )

    import pytest

    with pytest.raises(ValueError):
        eigen.estimate_dominant_eig(
            matvec_from_matrix(A), v0, method="lanczos_adaptive",
            precond=lambda r: r,
        )


def test_lanczos_adaptive_randomized_oracle():
    solve = jax.jit(
        lambda A, v0: eigen.lanczos_dominant_adaptive(
            matvec_from_matrix(A), v0, m_max=24, eps=1e-5
        )
    )
    for seed in range(4):
        r = np.random.default_rng(300 + seed)
        n = int(r.integers(24, 96))
        Q, _ = np.linalg.qr(r.normal(size=(n, n)))
        eigs = r.normal(size=n) * 3.0
        A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
        true_rho = float(np.max(np.abs(eigs)))
        v0 = tree_uniform_like({"x": jnp.zeros(n)})
        res = solve(A, v0)
        np.testing.assert_allclose(float(res.rho), true_rho, rtol=1e-3)


def test_lanczos_spectrum_topk_matches_dense():
    """lanczos_spectrum recovers the k dominant eigenvalues (signed,
    |value|-ordered, including a negative one) from ONE Krylov build,
    with orthonormal Ritz rows and small explicit residuals."""
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.normal(size=(40, 40)))
    eigs = np.concatenate([[7.0, -5.0, 3.0], np.linspace(0.05, 1.0, 37)])
    A = jnp.asarray((Q @ np.diag(eigs) @ Q.T).astype(np.float32))
    v0 = {"x": jnp.full((40,), 1.0 / np.sqrt(40), jnp.float32)}
    res = eigen.lanczos_spectrum(matvec_from_matrix(A), v0, k=3, m=20)
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), [7.0, -5.0, 3.0], rtol=1e-3
    )
    G = np.asarray(res.V @ res.V.T)
    np.testing.assert_allclose(G, np.eye(3), atol=1e-3)
    assert np.all(np.asarray(res.resid) < 1e-2)
    assert int(res.iters) == 20 + 3  # m HVPs + k explicit residuals

    # free-residual mode: no extra matvecs, same leading values
    res_free = eigen.lanczos_spectrum(
        matvec_from_matrix(A), v0, k=3, m=20, explicit_residual=False
    )
    assert int(res_free.iters) == 20
    np.testing.assert_allclose(
        np.asarray(res_free.eigenvalues), [7.0, -5.0, 3.0], rtol=1e-3
    )


def test_lanczos_spectrum_breakdown_masks_dead_pairs():
    """Krylov breakdown (start vector inside a low-dim invariant
    subspace — the advisor's degenerate-spectrum scenario) must NOT
    produce spurious 0.0 Ritz values with residual exactly 0.  Dead
    pairs are reported with resid = inf; the live leading block is
    exact."""
    eigs = np.array([5.0, 2.0, 2.0, 2.0] + [1.0] * 8, np.float32)
    A = jnp.asarray(np.diag(eigs))
    # start vector spans only the (e0, e1) invariant subspace ->
    # breakdown at step 2 of an m=8 build
    v0_flat = np.zeros(12, np.float32)
    v0_flat[0] = v0_flat[1] = 1.0
    v0 = {"x": jnp.asarray(v0_flat)}
    for explicit in (True, False):
        res = eigen.lanczos_spectrum(
            matvec_from_matrix(A), v0, k=4, m=8,
            explicit_residual=explicit,
        )
        lam = np.asarray(res.eigenvalues)
        resid = np.asarray(res.resid)
        # live block: the two reachable eigenvalues, tight residuals
        np.testing.assert_allclose(lam[:2], [5.0, 2.0], rtol=1e-5)
        assert np.all(resid[:2] < 1e-3)
        # dead pairs: masked as inf, never a false 0
        assert np.all(np.isinf(resid[2:])), resid

    # a genuine zero eigenvalue reachable from the start must NOT be
    # masked (dead-row mass, not value, is the criterion)
    eigs2 = np.array([5.0, 0.0, -3.0, 1.0, 0.5, 0.25], np.float32)
    A2 = jnp.asarray(np.diag(eigs2))
    v02 = tree_uniform_like({"x": jnp.zeros(6)})
    res2 = eigen.lanczos_spectrum(matvec_from_matrix(A2), v02, k=6, m=6)
    assert np.all(np.isfinite(np.asarray(res2.resid)))
    np.testing.assert_allclose(
        np.sort(np.asarray(res2.eigenvalues)), np.sort(eigs2), atol=1e-4
    )


def test_lanczos_spectrum_hvp_economy_vs_subspace():
    """The design point: equal answers to subspace iteration at a
    fraction of the HVPs (m total vs k per sweep), on a random
    symmetric operator."""
    r = np.random.default_rng(205)
    n = 60
    Q, _ = np.linalg.qr(r.normal(size=(n, n)))
    eigs = r.normal(size=n) * 3.0
    A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
    v0 = tree_uniform_like({"x": jnp.zeros(n)})
    top4 = eigs[np.argsort(-np.abs(eigs))[:4]]

    lz = jax.jit(
        lambda A, v0: eigen.lanczos_spectrum(
            matvec_from_matrix(A), v0, k=4, m=24
        )
    )(A, v0)
    ss = eigen.subspace_iteration(
        matvec_from_matrix(A), v0, k=4, eps=1e-6, max_iter=500
    )
    np.testing.assert_allclose(np.asarray(lz.eigenvalues), top4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lz.eigenvalues), np.asarray(ss.eigenvalues), rtol=1e-3
    )
    assert int(lz.iters) < int(ss.iters) * 4  # HVP economy
