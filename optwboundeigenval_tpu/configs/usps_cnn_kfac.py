"""USPS CNN with K-FAC comparator (reference params/usps_CNN_KFAC.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.0, K=0.0, optimizer="kfac", pow_iter=False,
                       ignore_bad_vals=False)
