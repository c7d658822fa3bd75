"""Chest x-ray DenseNet121 recipe (reference params/chestxray_mu0_0005_K0.py)."""

from optwboundeigenval_tpu.configs._cxr_family import chestxray_config


def options():
    return chestxray_config(mu=0.0005, K=0.0)
