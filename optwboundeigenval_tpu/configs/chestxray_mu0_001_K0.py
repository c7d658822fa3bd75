"""Chest x-ray DenseNet121 recipe (reference params/chestxray_mu0_001_K0.py)."""

from optwboundeigenval_tpu.configs._cxr_family import chestxray_config


def options():
    return chestxray_config(mu=0.001, K=0.0)
