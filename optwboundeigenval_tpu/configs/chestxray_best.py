"""Chest x-ray best unregularized model (reference params/chestxray_best.py)."""

from optwboundeigenval_tpu.configs._cxr_family import chestxray_config


def options():
    return chestxray_config(mu=0.0, K=0.0, best_reg=True)
