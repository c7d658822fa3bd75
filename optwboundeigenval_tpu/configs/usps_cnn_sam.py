"""USPS CNN with SAM comparator (reference params/usps_SAM.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.0, K=0.0, optimizer="sam", pow_iter=False)
