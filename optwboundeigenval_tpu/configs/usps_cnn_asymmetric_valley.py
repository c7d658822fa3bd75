"""USPS CNN with Asymmetric Valley trainer
(reference params/usps_CNN_AsymmetricValley.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.0, K=0.0, optimizer="sgd",
                       asymmetric_valley=True, swa_start=161, sgd_start=201,
                       max_iter=250)
