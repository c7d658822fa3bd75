"""Forest CoverType MLP.

Capability parity with reference ``Net`` (forest_data.py:75-89):
54 -> 20 -> 20 -> 7 with ``fc2`` applied twice (a deliberate
weight-tying quirk of the reference architecture, forest_data.py:85-86)
— preserved here because the published rho/accuracy baselines
(BASELINE.md) were trained with it.  Softmax-in-model is replaced by
logits output (see cnn_usps.py note).
"""

from __future__ import annotations

import flax.linen as nn

from optwboundeigenval_tpu.models.activations import relu
import jax.numpy as jnp


class ForestNet(nn.Module):
    hidden: int = 20
    num_classes: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        fc1 = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")
        fc3 = nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")
        x = relu(fc1(x))
        x = relu(fc2(x))
        x = relu(fc2(x))  # fc2 applied twice — reference weight tying
        return fc3(x)
