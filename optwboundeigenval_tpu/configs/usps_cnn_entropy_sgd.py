"""USPS CNN with Entropy-SGD comparator (reference params/usps_CNN_EntropySGD.py)."""

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    return usps_config(mu=0.0, K=0.0, optimizer="entropy_sgd",
                       pow_iter=False, ignore_bad_vals=False)
