"""Logistic regression — the saliency-map meta-classifier used by the
jaccard analysis (reference ``LogisticRegression``, dcnn.py:332-341)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LogisticRegression(nn.Module):
    num_outputs: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        return nn.Dense(self.num_outputs, dtype=self.dtype)(x)  # logits
