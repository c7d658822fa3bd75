"""Forest with Asymmetric Valley trainer
(reference params/forest_AsymmetricValley.py)."""

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    return forest_config(mu=0.0, K=0.0, asymmetric_valley=True,
                         swa_start=161, sgd_start=201, max_iter=250)
