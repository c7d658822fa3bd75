"""Forest with LOBPCG eigensolver (reference params/forest_lobpcg.py:
alpha(k)=exp(-4k-2), kfac_batch=8, kfac_rand=False)."""

import jax.numpy as jnp

from optwboundeigenval_tpu.configs._families import forest_config


def options():
    alpha = lambda i: jnp.exp(-4.0 * i.astype(jnp.float32) - 2.0)
    return forest_config(mu=0.0028, K=1.0, lobpcg=True, kfac_batch=8,
                         kfac_rand=False, pow_iter_alpha=alpha,
                         header="Forest_LOBPCG", verbose=True)
