"""USPS CNN with LOBPCG eigensolver (reference params/usps_CNN_lobpcg.py)."""

import jax.numpy as jnp

from optwboundeigenval_tpu.configs._families import usps_config


def options():
    alpha = lambda i: jnp.exp(-4.0 * i.astype(jnp.float32) - 2.0)
    return usps_config(mu=0.01, K=0.0, lobpcg=True, kfac_batch=8,
                       kfac_rand=False, pow_iter_alpha=alpha)
