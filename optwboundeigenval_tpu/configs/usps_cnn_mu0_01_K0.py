"""USPS CNN spectral-reg recipe (reference params/usps_CNN_mu0_01_K0.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.01, K=0.0)
