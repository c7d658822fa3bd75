"""Scheduler and misc optimizer-layer tests."""

import numpy as np

from optwboundeigenval_tpu.analysis.comp import intersect_classes
from optwboundeigenval_tpu.optim import schedules


def test_lambda_lr():
    s = schedules.LambdaLR(0.5, lambda k: 1.0 / (1.0 + k))
    assert s.lr == 0.5
    assert abs(s.step() - 0.25) < 1e-12
    assert abs(s.step() - 0.5 / 3) < 1e-12


def test_exponential_lr():
    s = schedules.ExponentialLR(1.0, gamma=0.5)
    assert s.step() == 0.5
    assert s.step() == 0.25


def test_cosine_lr_endpoints():
    s = schedules.CosineAnnealingLR(1.0, T_max=10, eta_min=0.1)
    lrs = [s.step() for _ in range(10)]
    assert abs(lrs[-1] - 0.1) < 1e-9
    assert lrs[0] > lrs[4] > lrs[-1]


def test_reduce_lr_on_plateau():
    s = schedules.ReduceLROnPlateau(1.0, factor=0.1, patience=2)
    # improving: no reduction
    for m in (1.0, 0.9, 0.8):
        lr = s.step(m)
    assert lr == 1.0
    # plateau for patience+1 epochs triggers reduction
    for m in (0.8, 0.8, 0.8):
        lr = s.step(m)
    assert abs(lr - 0.1) < 1e-12
    # counter resets after reduction
    lr = s.step(0.8)
    assert abs(lr - 0.1) < 1e-12


def test_intersect_classes():
    a = {"x": 0, "y": 1, "z": 2}
    b = {"y": 5, "z": 6, "w": 7}
    ra, rb = intersect_classes([a, b])
    assert list(ra.keys()) == ["y", "z"] == list(rb.keys())
    assert list(ra.values()) == [1, 2]
    assert list(rb.values()) == [5, 6]
