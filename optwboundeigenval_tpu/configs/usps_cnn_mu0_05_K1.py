"""USPS CNN spectral-reg recipe (reference params/usps_CNN_mu0_05_K1.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.05, K=1.0)
