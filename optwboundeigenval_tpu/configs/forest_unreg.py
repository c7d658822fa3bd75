"""Forest unregularized control (reference params/forest_unreg.py)."""

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    return forest_config(mu=0.0, K=0.0)
