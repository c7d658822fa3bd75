"""Chest x-ray DenseNet121 recipe (reference params/chestxray_mu0_01_K250.py)."""

from optwboundeigenval_tpu.configs._cxr_family import chestxray_config


def options():
    return chestxray_config(mu=0.01, K=250.0)
