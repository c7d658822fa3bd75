"""CIFAR-10 DenseNet-40-12 recipe (reference params/cifar10_DenseNet_mu0_01_K100.py)."""

from optwboundeigenval_tpu.configs._families import cifar10_config


def options():
    return cifar10_config(mu=0.01, K=100.0)
