"""Forest with SAM comparator (reference params/forest_SAM.py)."""

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    return forest_config(mu=0.0, K=0.0, optimizer="sam", pow_iter=False)
