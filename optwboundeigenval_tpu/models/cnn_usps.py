"""USPS digit CNN — the small end-to-end workhorse.

Capability parity with reference ``CNN`` (usps_data.py:298-336):
3x(conv3x3 + ReLU + maxpool2) -> fc64 -> fc10 on 16x16x1 inputs.

Deviations (documented reference quirks, SURVEY.md §7):
  * The reference applies softmax inside the model and then feeds the
    probabilities to ``nn.CrossEntropyLoss`` (a double-softmax,
    usps_data.py:335).  We output logits — idiomatic and numerically
    sound; the loss applies log-softmax once.
  * NHWC layout (TPU-native; conv lowering prefers channels-last).
"""

from __future__ import annotations

import flax.linen as nn

from optwboundeigenval_tpu.models.activations import relu
import jax.numpy as jnp


class CNNUSPS(nn.Module):
    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # accept (B, 256) flat or (B, 16, 16, 1) images
        if x.ndim == 2:
            x = x.reshape(-1, 16, 16, 1)
        x = x.astype(self.dtype)
        for features in (8, 16, 32):
            x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # (B, 2*2*32) = (B, 128)
        x = relu(nn.Dense(64, dtype=self.dtype)(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return x
