"""Chest x-ray SAM comparator (reference params/chestxray_best_reg_SAM.py)."""

from optwboundeigenval_tpu.configs._cxr_family import chestxray_config


def options():
    return chestxray_config(mu=0.0, K=0.0, optimizer="sam",
                            pow_iter=False, best_reg=True)
