"""Config factories for the three small workload families.

Each reference params file (SURVEY.md §2.10) maps to a thin module in
this package calling one of these factories.  Factories return the
``options() -> dict`` payload: live model/optimizer/loader objects plus
run-control flags, exactly the reference's python-module-as-config
pattern (opt.py:1990-1994).

Reference recipe sources:
  * USPS: params/usps_CNN_mu0_01_K0.py (Adam, batch 128, CE loss,
    CNN; mu/K grid + comparator variants)
  * Forest: params/forest_best.py (SGD lr=0.5, LambdaLR 1/(1+k),
    mu=0.0028 K=1), params/forest_lobpcg.py (alpha(k)=exp(-4k-2),
    kfac_batch=8, kfac_rand=False)
  * CIFAR-10: params/cifar10_DenseNet_mu0_01_K100.py (DenseNet-40-12,
    SGD lr=0.1 momentum 0.9 wd 1e-4, milestone LR 1/0.2/0.04 at
    60/80, batch 32, pow_iter_eps=0.05, max_pow_iter=100)
"""

from __future__ import annotations

import numpy as np


def usps_config(
    mu=0.01,
    K=0.0,
    Kmin=0.0,
    optimizer: str = "adam",
    pow_iter: bool = True,
    lobpcg: bool = False,
    asymmetric_valley: bool = False,
    batch_size: int = 128,
    max_iter: int = 100,
    augment: bool = False,
    **extra,
):
    from optwboundeigenval_tpu.data import usps
    from optwboundeigenval_tpu.models import CNNUSPS

    opt = {
        "seed": 1226,
        "tol": 0.001,
        "mu": mu,
        "K": K,
        "Kmin": Kmin,
        "batch_size": batch_size,
        "max_iter": max_iter,
        "header": "USPS",
        "model": CNNUSPS(),
        "loss": "cross_entropy",
        "pow_iter": pow_iter,
        "lobpcg": lobpcg,
        "asymmetric_valley": asymmetric_valley,
    }
    opt["train_loader"], opt["valid_loader"] = usps.get_train_valid_loader(
        batch_size=batch_size, augment=augment
    )
    opt["train_loader_na"] = usps.get_train_loader_na(batch_size=batch_size)
    opt["test_loader"] = [usps.get_test_loader(batch_size=batch_size)]
    opt["test_loader_aug"] = usps.get_test_loader(
        batch_size=batch_size, augment=True
    )
    opt["optimizer"] = _make_optimizer(optimizer, default_adam=True)
    opt.update(extra)
    return opt


def forest_config(
    mu=0.0028,
    K=1.0,
    Kmin=0.0,
    optimizer: str = "sgd",
    pow_iter: bool = True,
    lobpcg: bool = False,
    asymmetric_valley: bool = False,
    batch_size: int = 128,
    max_iter: int = 100,
    lr: float = 0.5,
    data_root: str = "./data",
    **extra,
):
    from optwboundeigenval_tpu.data import forest
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import schedules

    opt = {
        "seed": 1226,
        "tol": 0.001,
        "mu": mu,
        "K": K,
        "Kmin": Kmin,
        "batch_size": batch_size,
        "max_iter": max_iter,
        "header": "Forest",
        "model": ForestNet(),
        "loss": "cross_entropy",
        "pow_iter": pow_iter,
        "lobpcg": lobpcg,
        "asymmetric_valley": asymmetric_valley,
    }
    import jax.numpy as jnp

    opt.update(forest.get_data(data_root))
    opt["optimizer"] = _make_optimizer(optimizer, lr=lr)
    # beta(k) = 1/(1+k) LambdaLR (params/forest_best.py), built on the
    # optimizer's actual base lr (comparators use their own defaults)
    probe_state = opt["optimizer"].init({"w": jnp.zeros(1)})
    base = opt["optimizer"].get_learning_rate(probe_state)
    base_lr = float(base) if base is not None else lr
    opt["scheduler"] = schedules.LambdaLR(base_lr, lambda k: 1.0 / (1.0 + k))
    opt.update(extra)
    return opt


def cifar10_config(
    mu=0.01,
    K=100.0,
    Kmin=0.0,
    optimizer: str = "sgd",
    pow_iter: bool = True,
    batch_size: int = 32,
    max_iter: int = 100,
    augment: bool = True,
    **extra,
):
    from optwboundeigenval_tpu.data import cifar
    from optwboundeigenval_tpu.models.densenet import DenseNet3
    from optwboundeigenval_tpu.optim import schedules, sgd

    opt = {
        "seed": 1226,
        "tol": 0.001,
        "mu": mu,
        "K": K,
        "Kmin": Kmin,
        "batch_size": batch_size,
        "max_iter": max_iter,
        "header": "CIFAR10_DenseNet",
        "model": DenseNet3(depth=40, growth_rate=12, num_classes=10),
        "has_batch_stats": True,
        "loss": "cross_entropy",
        "pow_iter": pow_iter,
        "pow_iter_eps": 0.05,
        "max_pow_iter": 100,
        # measured-optimal on v5e: recomputing forward residuals in the
        # HVP tangent pass beats the HBM round-trip by 1.30x at batch
        # 128 (RESULTS.md MFU table); numerically exact
        "remat": True,
        # pipeline the epoch's dispatches (one metrics sync per epoch,
        # identical trajectory, snapshot NaN recovery): 2.5-3.2x
        # measured end-to-end (RESULTS.md spectral-step table)
        "defer_metrics": True,
    }
    (
        opt["train_loader"],
        opt["valid_loader"],
        opt["train_loader_na"],
    ) = cifar.get_train_valid_loader(batch_size=batch_size, augment=augment)
    opt["test_loader"] = [cifar.get_test_loader(batch_size=batch_size)]
    opt["optimizer"] = sgd(0.1, momentum=0.9, weight_decay=1e-4)

    # milestone schedule: 1 / 0.2 / 0.04 at epochs 60 / 80
    # (params/cifar10_DenseNet_mu0_01_K100.py alpha(i))
    def alpha(i):
        if i < 60:
            return 1.0
        elif i < 80:
            return 0.2
        return 0.2**2

    opt["scheduler"] = schedules.LambdaLR(0.1, alpha)
    opt.update(extra)
    return opt


def _make_optimizer(name: str, lr: float = None, default_adam: bool = False):
    from optwboundeigenval_tpu import optim

    name = name.lower()
    if name == "adam":
        return optim.adam(lr or 1e-3)
    if name == "sgd":
        return optim.sgd(lr or (0.1 if not default_adam else 0.5))
    if name == "sam":
        return optim.SAM(optim.sgd(lr or 0.1), rho=0.05)
    if name == "entropy_sgd":
        return optim.EntropySGD(lr=lr or 0.1, L=5)
    if name == "kfac":
        return optim.KFAC(lr=lr or 0.001)
    raise ValueError(f"unknown optimizer {name}")
