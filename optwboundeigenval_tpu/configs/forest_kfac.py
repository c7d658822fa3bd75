"""Forest with K-FAC comparator (reference params/forest_KFAC.py)."""

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    return forest_config(mu=0.0, K=0.0, optimizer="kfac", pow_iter=False)
