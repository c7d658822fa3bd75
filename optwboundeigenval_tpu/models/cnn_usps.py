"""USPS digit CNN — the small end-to-end workhorse.

Capability parity with reference ``CNN`` (usps_data.py:298-336):
3x(conv3x3 + ReLU + maxpool2) -> fc64 -> fc10 on 16x16x1 inputs.

Deviations (documented reference quirks, SURVEY.md §7):
  * The reference applies softmax inside the model and then feeds the
    probabilities to ``nn.CrossEntropyLoss`` (a double-softmax,
    usps_data.py:335).  We output logits — idiomatic and numerically
    sound; the loss applies log-softmax once.
  * NHWC layout (TPU-native; conv lowering prefers channels-last).

Performance note (``conv_impl``): tiny convolutions pay a fixed
~12.5 us non-fusing cost each on TPU, which dominates the HVP hot loop
(the compute itself is microseconds).  ``conv_impl='gemm'`` expresses
each conv as im2col patches + ONE matmul and the 2x2 maxpool as a
reshape-max.  Measured outcome (RESULTS.md): 0.63x — the lane-dim
patch concatenation costs more than the convs it replaces, so 'lax'
(XLA's conv) remains the default and the gemm path is kept as a
documented experiment with identical math (tests/test_models.py
validates exact numerical equivalence on shared params).
"""

from __future__ import annotations

import flax.linen as nn

from optwboundeigenval_tpu.models.activations import relu
import jax.numpy as jnp


def gemm_conv3x3_same(x, kernel, bias):
    """3x3 SAME conv as im2col + one matmul.  ``kernel``: (3, 3, cin,
    cout) — flatten order (kh, kw, cin) matches
    ops/kfac.extract_patches."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, 9*cin)
    out = patches.reshape(-1, 9 * cin) @ kernel.reshape(9 * cin, cout)
    return out.reshape(b, h, w, cout) + bias


def reshape_max_pool2(x):
    """2x2 stride-2 maxpool via reshape+max (fuses; reduce_window does
    not for these tiny shapes)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


class GemmConv3x3(nn.Module):
    """3x3 SAME conv as im2col + matmul, with nn.Conv-compatible param
    structure ({'kernel', 'bias'}) so checkpoints and K-FAC factor
    walking work identically across conv_impl choices."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), self.dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.dtype)
        return gemm_conv3x3_same(x, kernel, bias)


class CNNUSPS(nn.Module):
    num_classes: int = 10
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "lax"  # 'lax' | 'gemm'

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_impl not in ("lax", "gemm"):
            raise ValueError(
                f"conv_impl must be 'lax' or 'gemm', got {self.conv_impl!r}"
            )
        # accept (B, 256) flat or (B, 16, 16, 1) images
        if x.ndim == 2:
            x = x.reshape(-1, 16, 16, 1)
        x = x.astype(self.dtype)
        for i, features in enumerate((8, 16, 32)):
            if self.conv_impl == "gemm":
                x = GemmConv3x3(features, self.dtype, name=f"Conv_{i}")(x)
                x = relu(x)
                x = reshape_max_pool2(x)
            else:
                x = nn.Conv(features, (3, 3), padding="SAME",
                            dtype=self.dtype)(x)
                x = relu(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # (B, 2*2*32) = (B, 128)
        x = relu(nn.Dense(64, dtype=self.dtype)(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return x
