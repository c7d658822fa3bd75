"""Config + driver tests: every config module must build a valid
options dict and trainer; the driver cascade must run end-to-end on a
small recipe; DenseNet3 and the AsymmetricValley trainer must work."""

import importlib
import os
import pkgutil

import jax
import numpy as np
import pytest

import optwboundeigenval_tpu.configs as configs_pkg
from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_classification, make_images
from optwboundeigenval_tpu.models import DenseNet3, ForestNet
from optwboundeigenval_tpu.optim import sgd
from optwboundeigenval_tpu.train import SpectralTrainer, Task
from optwboundeigenval_tpu.train.driver import build_trainer, run

ALL_CONFIGS = [
    m.name
    for m in pkgutil.iter_modules(configs_pkg.__path__)
    if not m.name.startswith("_")
]


def test_config_inventory():
    # 27 configs in round 1 (usps 14, forest 7, cifar10 7 — chest x-ray
    # and cifar100 land with the DenseNet121 stack)
    assert len(ALL_CONFIGS) >= 27


@pytest.mark.parametrize(
    "name", [c for c in ALL_CONFIGS if c.startswith(("usps", "forest"))]
)
def test_config_builds_trainer(name):
    mod = importlib.import_module(f"optwboundeigenval_tpu.configs.{name}")
    opt = mod.options()
    assert "model" in opt and "optimizer" in opt
    tr = build_trainer(opt)
    assert tr.header2


@pytest.mark.parametrize(
    "name", [c for c in ALL_CONFIGS if c.startswith("cifar10")]
)
def test_cifar_config_options(name):
    mod = importlib.import_module(f"optwboundeigenval_tpu.configs.{name}")
    opt = mod.options()
    assert opt["has_batch_stats"] is True
    assert opt["pow_iter_eps"] == 0.05


@pytest.mark.parametrize(
    "name", [c for c in ALL_CONFIGS if c.startswith("chestxray")]
)
def test_chestxray_config_options(name):
    """Every chest x-ray recipe builds its full option dict (synthetic
    loaders, W-BCE loss, accauc sigmoid eval — reference
    params/chestxray_*.py surface)."""
    mod = importlib.import_module(f"optwboundeigenval_tpu.configs.{name}")
    opt = mod.options()
    assert opt["loss"] == "weighted_bce_with_logits"
    assert opt["test_func"] == "accauc sigmoid"
    assert opt["has_batch_stats"] is True
    assert opt["comp_test"] is True and opt["test"] is False
    for key in ("train_loader", "valid_loader"):
        assert opt[key] is not None
    if name.endswith("_vgg"):
        assert "vgg" in type(opt["model"]).__name__.lower() or getattr(
            opt["model"], "backbone", ""
        ).startswith("vgg")
    tr = build_trainer(opt)
    assert tr.header2.startswith("chestxray")


def test_driver_cascade_end_to_end(tmp_path, monkeypatch):
    """python main.py <config> equivalent on a tiny synthetic recipe:
    train -> test -> parse -> rho_test."""
    monkeypatch.chdir(tmp_path)
    x, y = make_classification(256, 10, 4, seed=0)
    xt, yt = make_classification(64, 10, 4, seed=0)
    opt = {
        "model": ForestNet(hidden=10, num_classes=4),
        "optimizer": sgd(0.1),
        "loss": "cross_entropy",
        "mu": 0.01,
        "K": 1.0,
        "batch_size": 32,
        "max_iter": 2,
        "min_iter": 1,
        "max_pow_iter": 20,
        "pow_iter_eps": 1e-2,
        "header": "DRV",
        "train_loader": ArrayLoader(x, y, 32, shuffle=True, seed=1),
        "valid_loader": ArrayLoader(xt, yt, 32),
        "test_loader": [ArrayLoader(xt, yt, 32)],
        "train": True,
        "test": True,
        "rho_test": True,
    }
    tr = run(opt)
    log = open(tr.log_file).read()
    assert "Test Loss:" in log and "Train Loss:" in log
    assert os.path.exists(os.path.join("./logs", tr.header2 + "_rho_test.csv"))
    assert os.path.exists(
        os.path.join("./logs", tr.header2 + "_summary.tsv")
    )


def test_densenet3_forward_and_hvp():
    """DenseNet3 (depth-10 for speed) forward + one spectral step with
    BN statistics handled."""
    task = Task(model=DenseNet3(depth=10, growth_rate=4, num_classes=10),
                has_batch_stats=True)
    x, y = make_images(16, shape=(32, 32, 3), n_classes=10, seed=0)
    loader = ArrayLoader(x, y, batch_size=8)
    tr = SpectralTrainer(
        task, sgd(0.1), mu=0.01, K=1.0, batch_size=8, max_iter=1, min_iter=1,
        max_pow_iter=5, pow_iter_eps=1e-1, header="DN3",
        log_dir="/tmp/dn3/logs", model_dir="/tmp/dn3/models",
    )
    tr.train(train_loader=loader)
    assert np.isfinite(tr.f) and np.isfinite(tr.rho)
    # batch_stats must have advanced from init
    assert tr.model_state and "batch_stats" in tr.model_state


def test_asymmetric_valley_trainer(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from optwboundeigenval_tpu.train.asymmetric_valley import (
        AsymmetricValleyTrainer,
    )

    x, y = make_classification(192, 10, 4, seed=0)
    xv, yv = make_classification(64, 10, 4, seed=0)
    task = Task(model=ForestNet(hidden=10, num_classes=4))
    tr = AsymmetricValleyTrainer(
        task, sgd(0.1),
        swa=True, swa_start=2, sgd_start=4, save_freq=1, eval_freq=1,
        division_part=4, distances=2,
        mu=0.0, K=0.0, batch_size=32, max_iter=6, min_iter=6,
        header="AV", log_dir=str(tmp_path / "logs"),
        model_dir=str(tmp_path / "models"),
    )
    tr.train(
        train_loader=ArrayLoader(x, y, 32, shuffle=True, seed=1),
        valid_loader=ArrayLoader(xv, yv, 32),
    )
    assert tr.swa_n >= 1
    log = open(tr.log_file).read()
    assert "Best Validation Accuracy" in log
    # interpolation artifacts appear when both sgd and swa points exist
    if tr.sgd_path is not None:
        assert os.path.exists(
            str(tmp_path / "logs" / "asymmetric_valley_train_loss_results.txt")
        )


def test_driver_aug_test_with_loader_list(tmp_path, monkeypatch):
    """aug_test over the USPS two-recipe augmented loader list
    (usps_data.py:25-33 variants; driver handles list or single)."""
    monkeypatch.chdir(tmp_path)
    from optwboundeigenval_tpu.models import CNNUSPS

    x, y = make_images(48, shape=(16, 16, 1), n_classes=10, seed=0)
    from optwboundeigenval_tpu.data.transforms import usps_augment

    opt = {
        "model": CNNUSPS(),
        "optimizer": sgd(0.1),
        "mu": 0.0, "K": 0.0, "pow_iter": False,
        "batch_size": 16, "max_iter": 1, "min_iter": 1,
        "header": "AUG",
        "train_loader": ArrayLoader(x, y, 16),
        "valid_loader": ArrayLoader(x[:16], y[:16], 16),
        "test": False,
        "aug_test": True,
        "test_loader_aug": [
            ArrayLoader(x[:32], y[:32], 16,
                        augment=usps_augment(1, 15)),
            ArrayLoader(x[:32], y[:32], 16,
                        augment=usps_augment(2, 30)),
        ],
    }
    tr = run(opt)
    log = open(tr.log_file).read()
    assert log.count("Aug Test Loss:") == 2


def test_driver_jaccard_path(tmp_path, monkeypatch):
    """jaccard=True with comp_fname: train a model, audit its saliency
    against a baseline checkpoint (driver cascade, opt.py:2090s)."""
    monkeypatch.chdir(tmp_path)
    from optwboundeigenval_tpu.models import CNNUSPS

    x, y = make_images(48, shape=(16, 16, 1), n_classes=10, seed=0)
    base_opt = {
        "model": CNNUSPS(),
        "optimizer": sgd(0.1),
        "mu": 0.0, "K": 0.0, "pow_iter": False,
        "batch_size": 16, "max_iter": 1, "min_iter": 1,
        "header": "BASE",
        "train_loader": ArrayLoader(x, y, 16),
        "valid_loader": ArrayLoader(x[:16], y[:16], 16),
        "test": False,
    }
    tr_base = run(base_opt)
    base_ckpt = os.path.join(
        "./models", tr_base.header2 + "_trained_model_best.msgpack"
    )
    assert os.path.exists(base_ckpt)

    opt = dict(base_opt)
    opt.update(
        header="AUDIT",
        train_loader=ArrayLoader(x, y, 16),
        test_loader=[ArrayLoader(x[:32], y[:32], 16)],
        jaccard=True,
        comp_fname=base_ckpt,
        max_img=1,
    )
    tr = run(opt)
    assert os.path.exists(
        os.path.join("./logs", tr.header2 + "_jaccard_cond.csv")
    )


def test_saliency_maps(tmp_path):
    from optwboundeigenval_tpu.analysis.saliency import saliency_maps
    from optwboundeigenval_tpu.models import CNNUSPS

    x, y = make_images(16, shape=(16, 16, 1), n_classes=10, seed=0)
    loader = ArrayLoader(x, y, batch_size=8)
    task = Task(model=CNNUSPS())
    tr = SpectralTrainer(
        task, sgd(0.1), mu=0.0, K=0.0, batch_size=8, max_iter=1, min_iter=1,
        pow_iter=False, header="SAL",
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=loader)
    saliency_maps(tr, loader, max_img=2, plot_dir=str(tmp_path / "plots"))
    assert os.path.exists(
        str(tmp_path / "plots" / f"{tr.header2}_saliency_0.png")
    )


def test_driver_device_data_flag(tmp_path, monkeypatch):
    """device_data=1 (CLI-overridable) routes the train loader through
    as_device_loader: same data, same seeded shuffle stream, trainer
    runs end-to-end on device-resident batches."""
    monkeypatch.chdir(tmp_path)
    x, y = make_classification(128, 10, 4, seed=0)
    xt, yt = make_classification(64, 10, 4, seed=0)

    def opts(device_data):
        return {
            "model": ForestNet(hidden=10, num_classes=4),
            "optimizer": sgd(0.1),
            "loss": "cross_entropy",
            "mu": 0.01, "K": 1.0, "batch_size": 32,
            "max_iter": 2, "min_iter": 1, "max_pow_iter": 20,
            "pow_iter_eps": 1e-2,
            "header": f"DRVDEV{int(device_data)}",
            "train_loader": ArrayLoader(x, y, 32, shuffle=True, seed=1),
            "valid_loader": ArrayLoader(xt, yt, 32),
            "train": True, "test": False,
            "device_data": device_data,
        }

    tr_host = run(opts(False))
    tr_dev = run(opts(True))
    import jax as _jax
    import numpy as _np
    for la, lb in zip(
        _jax.tree_util.tree_leaves(tr_host.params),
        _jax.tree_util.tree_leaves(tr_dev.params),
    ):
        _np.testing.assert_allclose(_np.asarray(la), _np.asarray(lb),
                                    rtol=1e-6, atol=1e-7)


def test_as_device_loader_rejects_host_augment():
    import numpy as _np
    import pytest as _pytest

    from optwboundeigenval_tpu.data.device import as_device_loader

    x = _np.zeros((8, 2), _np.float32)
    y = _np.zeros(8, _np.int32)
    ld = ArrayLoader(x, y, 4, augment=lambda xb, rng: xb)
    with _pytest.raises(ValueError):
        as_device_loader(ld)


def test_driver_device_data_unwraps_prefetch(tmp_path, monkeypatch):
    """device_data=1 over a PrefetchLoader-wrapped ArrayLoader drops the
    (now pointless) prefetch thread and converts the inner loader."""
    monkeypatch.chdir(tmp_path)
    from optwboundeigenval_tpu.data.loaders import PrefetchLoader

    x, y = make_classification(96, 10, 4, seed=0)
    opt = {
        "model": ForestNet(hidden=10, num_classes=4),
        "optimizer": sgd(0.1),
        "loss": "cross_entropy",
        "mu": 0.01, "K": 1.0, "batch_size": 32,
        "max_iter": 1, "min_iter": 1, "max_pow_iter": 10,
        "pow_iter_eps": 1e-1,
        "header": "DRVPF",
        "train_loader": PrefetchLoader(ArrayLoader(x, y, 32)),
        "train": True, "test": False,
    }
    opt["device_data"] = True
    tr = run(opt)
    assert tr.f == tr.f  # trained without error (finite check in train)


def test_asymmetric_valley_with_batchnorm_model(tmp_path, monkeypatch):
    """AV + BatchNorm model end-to-end: the SWA phase's bn_update must
    produce sane-scale statistics (regression: a hardcoded 0.99 EMA
    inversion inflated recovered stats 10x on the repo's momentum=0.9
    layers) and eval through them without accuracy collapse."""
    monkeypatch.chdir(tmp_path)
    from optwboundeigenval_tpu.train.asymmetric_valley import (
        AsymmetricValleyTrainer,
    )

    x, y = make_images(64, shape=(32, 32, 3), n_classes=4, seed=0)
    task = Task(
        model=DenseNet3(depth=10, growth_rate=4, num_classes=4),
        has_batch_stats=True,
    )
    tr = AsymmetricValleyTrainer(
        task, sgd(0.05),
        swa=True, swa_start=2, sgd_start=4, save_freq=1, eval_freq=1,
        division_part=4, distances=2,
        mu=0.0, K=0.0, batch_size=32, max_iter=4, min_iter=4,
        header="AVBN", log_dir=str(tmp_path / "logs"),
        model_dir=str(tmp_path / "models"),
    )
    tr.train(
        train_loader=ArrayLoader(x, y, 32, shuffle=True, seed=1),
        valid_loader=ArrayLoader(x[:32], y[:32], 32),
    )
    assert tr.swa_n >= 1
    state = tr.swa_model_state or tr.model_state
    refreshed = jax.tree.leaves(state["batch_stats"])
    raw = jax.tree.leaves(tr.model_state["batch_stats"])
    assert all(np.isfinite(np.asarray(l)).all() for l in refreshed)
    # bn_update stats must be the same SCALE as the EMA-trained ones
    # (the 0.99-inversion bug made them ~10x larger)
    mx_ref = max(float(np.abs(np.asarray(l)).max()) for l in refreshed)
    mx_raw = max(float(np.abs(np.asarray(l)).max()) for l in raw)
    assert mx_ref < 4.0 * max(mx_raw, 1.0)


def test_driver_passes_eigensolver_knobs():
    """eigensolver / lanczos_m / pow_iter_momentum flow from an
    options() dict through the reflection driver (opt.py:1940-1965
    equivalent) into the trainer ctor."""
    mod = importlib.import_module(
        "optwboundeigenval_tpu.configs.forest_best"
    )
    opt = dict(mod.options())
    opt.update(eigensolver="lanczos", lanczos_m=12)
    tr = build_trainer(opt)
    assert tr.eigensolver == "lanczos" and tr.lanczos_m == 12

    opt = dict(mod.options())
    opt.update(pow_iter_momentum=0.9)
    tr = build_trainer(opt)
    assert tr.pow_iter_momentum == 0.9


def test_best_reg_configs_use_auto_eigensolver_policy():
    """The perf-oriented rand_init recipes (reference params/
    chestxray_best_reg.py regime) ship eigensolver='auto': the
    rand_init path resolves to the measured ~2x early-exit Krylov
    solver, while the lobpcg variant resolves back to power (its own
    preconditioned solver).  Parity recipes keep 'power'."""
    mod = importlib.import_module(
        "optwboundeigenval_tpu.configs.chestxray_best_reg"
    )
    opt = mod.options()
    assert opt["eigensolver"] == "auto" and opt["rand_init"] is True
    tr = build_trainer(opt)
    assert tr.eigensolver_requested == "auto"
    assert tr.eigensolver == "lanczos_adaptive"

    mod = importlib.import_module(
        "optwboundeigenval_tpu.configs.chestxray_best_lobpcg"
    )
    tr = build_trainer(mod.options())
    assert tr.eigensolver == "power" and tr.lobpcg

    mod = importlib.import_module(
        "optwboundeigenval_tpu.configs.chestxray_mu0_01_K0"
    )
    tr = build_trainer(mod.options())
    assert tr.eigensolver == "power"
