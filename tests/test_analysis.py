"""Analysis-subsystem tests: covariate shift, guided backprop,
Grad-CAM, jaccard audit, distance/create_dist, GAN training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm, skewnorm

from optwboundeigenval_tpu.analysis import cov_shift, distance, jaccard
from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_classification, make_images
from optwboundeigenval_tpu.models import CNNUSPS, ForestNet
from optwboundeigenval_tpu.optim import sgd
from optwboundeigenval_tpu.train import SpectralTrainer, Task


# ---------------------------------------------------------------------------
# covariate shift
# ---------------------------------------------------------------------------


def test_get_prob_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 4))
    lp = cov_shift.get_prob(x, m=[0.5], sd=[1.2], skew=[0])
    expected = norm.logpdf(x, 0.5, 1.2).sum(axis=1)
    np.testing.assert_allclose(lp, expected, rtol=1e-10)
    lp2 = cov_shift.get_prob(x, m=[0.0], sd=[1.0], skew=[1.5])
    expected2 = skewnorm.logpdf(x, 1.5, 0.0, 1.0).sum(axis=1)
    np.testing.assert_allclose(lp2, expected2, rtol=1e-10)


def make_small_trainer(tmp_path, header="CS"):
    x, y = make_classification(256, 8, 3, seed=0)
    xv, yv = x[:64], y[:64]
    task = Task(model=ForestNet(hidden=8, num_classes=3))
    tr = SpectralTrainer(
        task, sgd(0.2), mu=0.0, K=0.0, pow_iter=False, batch_size=32,
        max_iter=2, min_iter=1, header=header,
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(
        train_loader=ArrayLoader(x, y, 32, shuffle=True, seed=1),
        valid_loader=ArrayLoader(xv, yv, 32),
    )
    return tr, x, y


def test_cov_shift_identity_weights_match_plain_eval(tmp_path):
    """With zero shift the weights are 1 and accuracy equals plain
    accuracy."""
    tr, x, y = make_small_trainer(tmp_path)
    loss, acc, f1, wmin, wmax = cov_shift.test_model_cov(tr, x, y)
    _, acc_plain, f1_plain = tr.test_model(loader=ArrayLoader(x, y, 32))
    np.testing.assert_allclose(acc, acc_plain, rtol=1e-5)
    assert wmin == 1.0 and wmax == 1.0


def test_cov_shift_tester_csvs(tmp_path):
    tr, x, y = make_small_trainer(tmp_path, header="CST")
    acc, f1, idx = cov_shift.cov_shift_tester(
        [tr], x[:96], y[:96], iters=3, mult=0.1, mean_diff=1.0,
        header="T", log_dir=str(tmp_path / "logs"), seed=0,
    )
    assert acc.shape == (1, 3) and np.all(np.isfinite(acc))
    assert os.path.exists(str(tmp_path / "logs" / "T_cov_shift_acc.csv"))
    # plots + slope comparison
    out = cov_shift.cov_shift_plots(
        acc, idx, ["model"], baselines=[float(acc.mean())],
        out_path=str(tmp_path / "plots" / "cs.png"),
    )
    assert os.path.exists(out)
    rows, comps = cov_shift.slope_comparison(
        np.vstack([acc, acc + 0.1]), idx, ["a", "b"]
    )
    assert len(rows) == 2 and len(comps) == 1


# ---------------------------------------------------------------------------
# interpretability
# ---------------------------------------------------------------------------


def cnn_trainer(tmp_path, header):
    x, y = make_images(64, shape=(16, 16, 1), n_classes=10, seed=3)
    task = Task(model=CNNUSPS())
    tr = SpectralTrainer(
        task, sgd(0.1), mu=0.0, K=0.0, pow_iter=False, batch_size=16,
        max_iter=1, min_iter=1, header=header,
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=ArrayLoader(x, y, 16))
    return tr, x, y


def test_guided_backprop_differs_from_plain(tmp_path):
    from optwboundeigenval_tpu.analysis.guided_backprop import (
        generate_gradients,
    )

    tr, x, y = cnn_trainer(tmp_path, "GBP")
    xj = jnp.asarray(x[:4])
    guided = np.asarray(
        generate_gradients(tr.task, tr.params, tr.model_state, xj)
    )
    assert guided.shape == (4, 16, 16, 1)
    assert np.all(np.isfinite(guided))


def test_grad_cam(tmp_path):
    from optwboundeigenval_tpu.analysis.grad_cam import (
        grad_cam,
        show_cam_on_image,
    )

    tr, x, y = cnn_trainer(tmp_path, "CAM")
    # last conv of CNNUSPS is Conv_2
    cam = grad_cam(tr.task, tr.params, tr.model_state, jnp.asarray(x[:4]),
                   "Conv_2")
    assert cam.shape == (4, 16, 16)
    assert cam.min() >= 0 and cam.max() <= 1 + 1e-6
    overlay = show_cam_on_image(x[0, :, :, 0], cam[0])
    assert overlay.shape == (16, 16, 3)


def test_grad_cam_unknown_layer_raises(tmp_path):
    from optwboundeigenval_tpu.analysis.grad_cam import grad_cam

    tr, x, _ = cnn_trainer(tmp_path, "CAM2")
    with pytest.raises(KeyError):
        grad_cam(tr.task, tr.params, tr.model_state, jnp.asarray(x[:2]),
                 "NoSuchLayer")


def test_jaccard_audit_and_comp(tmp_path):
    tr1, x, y = cnn_trainer(tmp_path, "JAC1")
    tr2, _, _ = cnn_trainer(tmp_path, "JAC2")
    loader = ArrayLoader(x[:32], y[:32], 16)
    res = jaccard.jaccard_audit(
        tr1, tr2, loader, quantile=0.9, max_img=2, train_meta=True,
        log_dir=str(tmp_path / "logs"), plot_dir=str(tmp_path / "plots"),
    )
    assert res["jaccard"].shape == (32,)
    assert np.all((res["jaccard"] >= 0) & (res["jaccard"] <= 1))
    assert res["conditioned"].shape == (2, 2)
    assert res["meta"] is not None
    assert os.path.exists(
        str(tmp_path / "logs" / f"{tr1.header2}_jaccard_cond.csv")
    )
    mat = jaccard.jaccard_comp([tr1, tr2], loader,
                               log_dir=str(tmp_path / "logs"))
    assert mat.shape == (2, 2) and mat[0, 0] == 1.0


def test_f1_max_cutoffs():
    rng = np.random.default_rng(0)
    labels = (rng.random((200, 3)) < 0.4).astype(np.float32)
    scores = labels * 0.7 + rng.random((200, 3)) * 0.3
    cuts = jaccard.f1_max_cutoffs(labels, scores)
    assert cuts.shape == (3,)
    assert np.all((cuts > 0) & (cuts < 1))


# ---------------------------------------------------------------------------
# distance / create_dist
# ---------------------------------------------------------------------------


def test_nearest_distances_against_scipy():
    from scipy.spatial import distance_matrix

    rng = np.random.default_rng(0)
    a = rng.normal(size=(12, 7)).astype(np.float32)
    b = rng.normal(size=(9, 7)).astype(np.float32)
    ours = distance.nearest_distances(a, b, "euclid")
    expected = distance_matrix(a, b).min(axis=0)
    np.testing.assert_allclose(ours, expected, rtol=1e-4)
    ours_c = distance.nearest_distances(a, b, "cosine")
    from sklearn.metrics.pairwise import cosine_similarity

    np.testing.assert_allclose(
        ours_c, cosine_similarity(a, b).max(axis=0), rtol=1e-5
    )


def test_create_dist_dataset(tmp_path):
    x0, y0 = make_images(32, shape=(16, 16, 1), n_classes=10, seed=0)
    x1, y1 = make_images(64, shape=(16, 16, 1), n_classes=10, seed=1)
    x2, y2 = make_images(64, shape=(16, 16, 1), n_classes=10, seed=2)
    out = distance.create_dist_dataset(
        x0, (x1.reshape(64, -1), y1), (x2.reshape(64, -1), y2),
        zeroes=2, name="constructed_test", data_dir=str(tmp_path / "data"),
        plot_dir=str(tmp_path / "plots"), seed=0,
    )
    z = np.load(out)
    assert z["x"].ndim == 4 and len(z["x"]) == len(z["y"])


def test_create_dist_cli(tmp_path, monkeypatch):
    """scripts/create_dist.py reference CLI surface
    (create_dist.py:65-118): builds <name>.npz from the USPS test set
    and its two augmented pools (synthetic fallback offline)."""
    import importlib

    monkeypatch.chdir(tmp_path)
    mod = importlib.import_module("scripts.create_dist")
    mod.main(["--dist", "cosine", "--name", "constructed_cli",
              "--zeroes", "2", "--seed", "0",
              "--data_dir", str(tmp_path / "data"),
              "--plot_dir", str(tmp_path / "plots")])
    z = np.load(tmp_path / "data" / "constructed_cli.npz")
    assert z["x"].ndim == 4 and len(z["x"]) == len(z["y"])
    # consumable by the GAN loader, as in the reference flow
    from optwboundeigenval_tpu.data import usps

    loader = usps.get_gan_loader(
        batch_size=64, file="constructed_cli.npz",
        root=str(tmp_path / "data"),
    )
    b = next(iter(loader))
    assert b["x"].shape[1:] == (16, 16, 1)


# ---------------------------------------------------------------------------
# GANs
# ---------------------------------------------------------------------------


def test_mlp_cgan_trains_and_generates(tmp_path):
    from optwboundeigenval_tpu.analysis.gan_train import (
        generate_dataset,
        train_cgan,
    )
    from optwboundeigenval_tpu.models.gan import (
        MLPDiscriminator,
        MLPGenerator,
    )

    x, y = make_images(64, shape=(16, 16, 1), n_classes=10, seed=0)
    x = np.clip(x, -1, 1)
    g = MLPGenerator(n=16, latent_dim=8)
    d = MLPDiscriminator(n=16)
    g_params, g_state, d_params, hist = train_cgan(
        x, y, g, d, n_epochs=2, batch_size=16, latent_dim=8, seed=0,
        smooth=0.1, swap=0.05,
    )
    assert len(hist) == 2 and np.isfinite(hist[-1][1])
    out = generate_dataset(
        g, g_params, g_state, n_images=32, latent_dim=8,
        out_path=str(tmp_path / "gan_usps.npz"),
    )
    z = np.load(out)
    assert z["x"].shape == (32, 16, 16, 1)


def test_dc_cgan_shapes():
    from optwboundeigenval_tpu.models.gan import DCDiscriminator, DCGenerator

    g = DCGenerator(feat=8)
    d = DCDiscriminator(feat=8)
    z = jnp.zeros((2, 100))
    labels = jnp.zeros((2,), jnp.int32)
    gv = g.init(jax.random.PRNGKey(0), z, labels, train=False)
    img = g.apply(gv, z, labels, train=False)
    assert img.shape == (2, 32, 32, 1)
    dv = d.init({"params": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}, img, labels, train=False)
    out = d.apply(dv, img, labels, train=False)
    assert out.shape == (2, 1)


# ---------------------------------------------------------------------------
# jaccard discrimination (behavioral guard, reference opt.py:1364-1855)
# ---------------------------------------------------------------------------


def _quadrant_trainer(tmp_path, quadrant, header, seed=0, n=256, epochs=4):
    """Train a small CNN on 16x16 images whose class signal lives ONLY
    in one 8x8 quadrant (the rest is N(0, .3) noise), so the trained
    model's input-gradient saliency must concentrate there (the fc
    layer after flatten is location-sensitive even though convs are
    translation-equivariant)."""
    rng = np.random.default_rng(seed)
    n_classes = 4
    x = rng.normal(0, 0.3, size=(n, 16, 16, 1)).astype(np.float32)
    y = rng.integers(0, n_classes, size=n).astype(np.int64)
    r0, c0 = quadrant
    patterns = np.zeros((n_classes, 8, 8), np.float32)
    patterns[0, ::2, :] = 2.0  # horizontal stripes
    patterns[1, :, ::2] = 2.0  # vertical stripes
    patterns[2, :4, :] = 2.0   # top band
    patterns[3, :, :4] = 2.0   # left band
    for i in range(n):
        x[i, r0:r0 + 8, c0:c0 + 8, 0] += patterns[y[i]]

    task = Task(model=CNNUSPS(num_classes=n_classes))
    tr = SpectralTrainer(
        task, sgd(0.1), mu=0.0, K=0.0, pow_iter=False, batch_size=32,
        max_iter=epochs, min_iter=epochs, header=header,
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=ArrayLoader(x, y, 32, shuffle=True, seed=seed))
    return tr, x, y


def test_jaccard_discriminates_attention_location(tmp_path):
    """Behavioral guard for the jaccard audit: two models trained to
    attend the SAME quadrant must overlap far more than two models
    trained on DIFFERENT quadrants, and a model's thresholded saliency
    must actually sit on its signal quadrant.  A regression in the
    mask/threshold/overlap logic (maps mixed up, thresholds applied to
    the wrong axis, masks inverted) breaks these orderings even though
    protocol-shape tests still pass."""
    trA, xA, yA = _quadrant_trainer(tmp_path, (0, 0), "JQA", seed=0)
    trA2, _, _ = _quadrant_trainer(tmp_path, (0, 0), "JQA2", seed=1)
    trB, _, _ = _quadrant_trainer(tmp_path, (8, 8), "JQB", seed=2)

    # all three models actually learned their task
    _, accA, _ = trA.test_model(loader=ArrayLoader(xA, yA, 32))
    assert accA > 60.0, accA

    loader = ArrayLoader(xA[:64], yA[:64], 32)
    resAA = jaccard.jaccard_audit(
        trA, trA2, loader, quantile=0.9,
        log_dir=str(tmp_path / "jlogs"), plot_dir=str(tmp_path / "jplots"),
        tag="same",
    )
    resAB = jaccard.jaccard_audit(
        trA, trB, loader, quantile=0.9,
        log_dir=str(tmp_path / "jlogs"), plot_dir=str(tmp_path / "jplots"),
        tag="diff",
    )
    jAA, jAB = float(np.mean(resAA["jaccard"])), float(np.mean(resAB["jaccard"]))
    # same-quadrant models overlap decisively more than cross-quadrant
    assert jAA > 1.5 * jAB, (jAA, jAB)

    # localization: A's top-10% saliency mass sits in its 1/4 quadrant
    sm = jaccard.saliency_map(trA.task, trA.params, trA.model_state, xA[:64])
    mask = jaccard.threshold_mask(sm, None, 0.9)
    frac_in_quadrant = float(mask[:, :8, :8].sum() / np.maximum(mask.sum(), 1))
    assert frac_in_quadrant > 0.5, frac_in_quadrant  # chance = 0.25

    # jaccard_comp pairwise matrix preserves the same ordering
    mat = jaccard.jaccard_comp(
        [trA, trA2, trB], loader, log_dir=str(tmp_path / "jlogs")
    )
    assert mat[0, 1] > mat[0, 2], mat
