"""Forest with Entropy-SGD comparator (reference params/forest_EntropySGD.py)."""

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    return forest_config(mu=0.0, K=0.0, optimizer="entropy_sgd", pow_iter=False)
