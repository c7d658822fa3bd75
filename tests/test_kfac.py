"""K-FAC tests: capture correctness (activations / grad-outputs vs
direct autodiff), covariance scaling parity, natural-grad apply vs
dense Kronecker inverse, KFAC optimizer end-to-end, and LOBPCG
preconditioned training."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_classification, make_images
from optwboundeigenval_tpu.models import CNNUSPS, ForestNet
from optwboundeigenval_tpu.ops import kfac as kfac_ops
from optwboundeigenval_tpu.optim import KFAC, sgd
from optwboundeigenval_tpu.train import SpectralTrainer, Task


def small_batch(n=16, d=10, c=4, seed=0):
    x, y = make_classification(n, d, c, seed=seed)
    return {"x": jnp.asarray(x), "y": jnp.asarray(y),
            "w": jnp.ones(n, jnp.float32)}


def test_capture_activations_and_grad_outputs():
    task = Task(model=ForestNet(hidden=6, num_classes=4))
    batch = small_batch()
    params, ms = task.init(jax.random.PRNGKey(0), batch["x"])
    loss, caps = kfac_ops.capture(task, params, ms, batch)
    # fc1's activation is the raw input
    assert "fc1" in caps and "fc2" in caps and "fc3" in caps
    np.testing.assert_allclose(np.asarray(caps["fc1"].a), np.asarray(batch["x"]))
    # grad-output of the last layer for CE-from-logits is (softmax - onehot)/N
    logits = task.model.apply({"params": params}, batch["x"], train=True)
    p = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(batch["y"], 4)
    expected_g = (p - onehot) / batch["x"].shape[0]
    np.testing.assert_allclose(
        np.asarray(caps["fc3"].g), np.asarray(expected_g), rtol=1e-5, atol=1e-7
    )


def test_capture_weight_tied_layer_records_last_call():
    """ForestNet applies fc2 twice; interceptor records per-path (the
    reference's hooks overwrite with the latest call too)."""
    task = Task(model=ForestNet(hidden=6, num_classes=4))
    batch = small_batch()
    params, ms = task.init(jax.random.PRNGKey(0), batch["x"])
    _, caps = kfac_ops.capture(task, params, ms, batch)
    assert caps["fc2"].a.shape == (16, 6)


def test_extract_patches_matches_conv():
    """Patch extraction is consistent with flax conv: patches @
    flattened kernel == conv output."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 3))
    kernel = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 5))
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    patches = kfac_ops.extract_patches(x, (3, 3), (1, 1), "SAME")
    out2 = patches @ kernel.reshape(-1, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-4,
                               atol=1e-5)


def test_natural_grad_is_kron_inverse():
    """With factors set explicitly and damping 0, apply_to_tree computes
    G^{-1} M A^{-1} (kfac.py:117)."""
    rng = np.random.default_rng(0)
    na, ng = 5, 3  # in+bias, out
    A = rng.normal(size=(na, na))
    A = A @ A.T + np.eye(na)
    G = rng.normal(size=(ng, ng))
    G = G @ G.T + np.eye(ng)
    d_a, Q_a = np.linalg.eigh(A)
    d_g, Q_g = np.linalg.eigh(G)
    f = kfac_ops.LayerFactors(
        m_aa=jnp.asarray(A), m_gg=jnp.asarray(G),
        Q_a=jnp.asarray(Q_a), d_a=jnp.asarray(d_a),
        Q_g=jnp.asarray(Q_g), d_g=jnp.asarray(d_g),
    )
    kernel = rng.normal(size=(na - 1, ng))  # flax dense (in, out)
    bias = rng.normal(size=(ng,))
    tree = {"layer": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
    out = kfac_ops.apply_to_tree({"layer": f}, tree, damping=0.0)
    M = np.concatenate([kernel.T, bias.reshape(-1, 1)], axis=1)  # (out, in+1)
    expected = np.linalg.inv(G) @ M @ np.linalg.inv(A)
    got = np.concatenate(
        [np.asarray(out["layer"]["kernel"]).T,
         np.asarray(out["layer"]["bias"]).reshape(-1, 1)],
        axis=1,
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_cov_scaling_linear():
    """Linear CovA = a^T a / B with bias column; CovG (batch_averaged) =
    g^T g * B (kfac.py:309-314, 359-367)."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 4)).astype(np.float32)
    g = rng.normal(size=(8, 3)).astype(np.float32)
    cap = kfac_ops.LayerCapture(a=jnp.asarray(a), g=jnp.asarray(g),
                                kind="dense", conv_cfg=None)
    aa = np.asarray(kfac_ops.cov_a(cap, has_bias=True))
    a_aug = np.concatenate([a, np.ones((8, 1), np.float32)], axis=1)
    np.testing.assert_allclose(aa, a_aug.T @ a_aug / 8, rtol=1e-5)
    gg = np.asarray(kfac_ops.cov_g(cap, batch_averaged=True))
    np.testing.assert_allclose(gg, g.T @ g * 8, rtol=1e-5)


def test_kfac_optimizer_trains(tmp_path):
    x, y = make_classification(320, 10, 4, seed=0)
    loader = ArrayLoader(x, y, batch_size=32, shuffle=True, seed=1)
    task = Task(model=ForestNet(hidden=12, num_classes=4))
    tr = SpectralTrainer(
        task,
        KFAC(lr=0.01, TCov=2, TInv=4, kfac_rand=True),
        mu=0.01, K=1.0, batch_size=32, max_iter=2, min_iter=1,
        max_pow_iter=20, pow_iter_eps=1e-2, header="KFACOPT",
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=loader)
    assert np.isfinite(tr.f)
    assert tr.header2.startswith("KFACOPT_KFAC")


def test_lobpcg_preconditioned_training(tmp_path):
    x, y = make_classification(320, 10, 4, seed=2)
    loader = ArrayLoader(x, y, batch_size=32, shuffle=True, seed=3)
    task = Task(model=ForestNet(hidden=12, num_classes=4))
    tr = SpectralTrainer(
        task,
        sgd(0.1),
        mu=0.01, K=1.0, batch_size=32, max_iter=2, min_iter=1,
        max_pow_iter=20, pow_iter_eps=1e-2, header="LOBPCG",
        lobpcg=True, kfac_batch=2, kfac_rand=False,
        pow_iter_alpha=0.1,
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=loader)
    assert np.isfinite(tr.f) and np.isfinite(tr.rho)
    assert tr._precond_state is not None


def test_kfac_on_conv_model(tmp_path):
    x, y = make_images(32, shape=(16, 16, 1), n_classes=10, seed=0)
    loader = ArrayLoader(x, y, batch_size=16, shuffle=True, seed=1)
    task = Task(model=CNNUSPS())
    tr = SpectralTrainer(
        task,
        KFAC(lr=0.01, TCov=1, TInv=2),
        mu=0.0, K=0.0, batch_size=32, max_iter=1, min_iter=1,
        max_pow_iter=10, pow_iter_eps=1e-2, header="KFACCNN",
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=loader)
    assert np.isfinite(tr.f)


def test_cov_factors_exact_on_padded_batch():
    """Padding exactness (repo convention): cov_a/cov_g computed on a
    zero-weight-padded batch equal those on the unpadded sub-batch —
    padded rows are masked and the REAL example count normalizes."""
    task = Task(model=ForestNet(hidden=6, num_classes=4))
    x, y = make_classification(12, 10, 4, seed=3)
    params, ms = task.init(jax.random.PRNGKey(1), jnp.asarray(x))

    clean = {"x": jnp.asarray(x), "y": jnp.asarray(y),
             "w": jnp.ones(12, jnp.float32)}
    # pad with GARBAGE rows at zero weight — masking must remove them
    pad_x = 99.0 * jnp.ones((4, 10), jnp.float32)
    padded = {
        "x": jnp.concatenate([clean["x"], pad_x]),
        "y": jnp.concatenate([clean["y"], jnp.zeros(4, clean["y"].dtype)]),
        "w": jnp.concatenate([clean["w"], jnp.zeros(4, jnp.float32)]),
    }
    _, caps_c = kfac_ops.capture(task, params, ms, clean)
    _, caps_p = kfac_ops.capture(task, params, ms, padded)
    for path in caps_c:
        aa_c = np.asarray(kfac_ops.cov_a(caps_c[path], has_bias=True))
        aa_p = np.asarray(kfac_ops.cov_a(caps_p[path], has_bias=True))
        np.testing.assert_allclose(aa_p, aa_c, rtol=1e-5, atol=1e-6)
        for ba in (True, False):
            gg_c = np.asarray(kfac_ops.cov_g(caps_c[path], batch_averaged=ba))
            gg_p = np.asarray(kfac_ops.cov_g(caps_p[path], batch_averaged=ba))
            np.testing.assert_allclose(gg_p, gg_c, rtol=1e-5, atol=1e-6)
