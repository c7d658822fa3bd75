"""USPS CNN spectral-reg recipe (reference params/usps_CNN_mu0_1_K2.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.1, K=2.0)
