"""VAE over backbone features + its loss.

Capability parity with reference ``VAE`` (dcnn.py:343-372) and
``VLoss`` (dcnn.py:403-414): encoder trunk -> (mu, logvar) heads ->
reparameterized z -> 2-layer decoder; loss = weighted-BCE
reconstruction + w * KL.  (Defined but not wired into any params file
in the reference — same status here.)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from optwboundeigenval_tpu.models.activations import relu
import jax
import jax.numpy as jnp

from optwboundeigenval_tpu.train.task import weighted_bce_with_logits


class VAE(nn.Module):
    encoder: nn.Module
    znum: int = 128
    hnum: int = 256
    outnum: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = relu(self.encoder(x, train))
        h = jnp.max(h, axis=(1, 2)) if h.ndim == 4 else h
        mu = nn.Dense(self.znum, dtype=self.dtype, name="mu_fc")(h)
        logvar = nn.Dense(self.znum, dtype=self.dtype, name="logv_fc")(h)
        if train:
            rng = self.make_rng("reparam")
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, std.shape, std.dtype)
        else:
            z = mu
        h3 = relu(nn.Dense(self.hnum, dtype=self.dtype, name="de1")(z))
        out = nn.Dense(self.outnum, dtype=self.dtype, name="de2")(h3)
        return out, mu, logvar


def vae_loss(outputs, y, w=None, kl_weight: float = 0.0):
    """VLoss (dcnn.py:403-414): W-BCE reconstruction + w * KL."""
    recon, mu, logvar = outputs
    bce = weighted_bce_with_logits(recon, y, w)
    kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
    return bce + kl_weight * kld
