"""Forest best spectral-reg recipe (reference params/forest_best.py:
mu=0.0028, K=1, SGD lr=0.5, LambdaLR 1/(1+k))."""

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    return forest_config(mu=0.0028, K=1.0)
