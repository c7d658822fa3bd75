"""Conditional GANs used to synthesize shifted test distributions.

Capability parity with the reference's two standalone scripts:
  * ``gan.py`` (MLP cGAN, gan.py:53-296): label-embedding MLP generator
    (z=100, blocks 128→256→512→1024 with BatchNorm+LeakyReLU, Tanh
    output) and MLP discriminator with dropout; BCE adversarial loss.
  * ``cGAN.py`` (DC-cGAN, cGAN.py:80-256): ConvTranspose generator /
    Conv discriminator at 32x32 with the label embedded as an extra
    channel.

Training loops live in analysis/gan_train.py (jitted alternating
updates); generated datasets are saved as ``.npz`` consumed by
``data.usps.get_gan_loader`` (usps_data.py:268-295 parity).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from optwboundeigenval_tpu.models.norm import BatchNorm
import jax.numpy as jnp


class MLPGenerator(nn.Module):
    """gan.py Generator (n=128 default)."""

    n_classes: int = 10
    latent_dim: int = 100
    img_shape: Tuple[int, int, int] = (16, 16, 1)
    n: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, labels, train: bool = True):
        emb = nn.Embed(self.n_classes, self.n_classes, dtype=self.dtype)(labels)
        x = jnp.concatenate([emb, z], axis=-1)
        widths = (self.n, self.n * 2, self.n * 4, self.n * 8)
        for i, w in enumerate(widths):
            x = nn.Dense(w, dtype=self.dtype)(x)
            if i > 0:  # first block unnormalized (gan.py:66)
                # the reference's BatchNorm1d(out_feat, 0.8) sets
                # EPS=0.8 (second positional arg), NOT momentum — the
                # well-known PyTorch-GAN quirk; running-stat decay
                # stays at torch's default 0.1 (flax momentum 0.9)
                x = BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=0.8, dtype=self.dtype,
                )(x)
            x = nn.leaky_relu(x, 0.2)
        out_dim = self.img_shape[0] * self.img_shape[1] * self.img_shape[2]
        x = nn.Dense(out_dim, dtype=self.dtype)(x)
        x = jnp.tanh(x)
        return x.reshape((-1,) + self.img_shape)


class MLPDiscriminator(nn.Module):
    """gan.py Discriminator (logits out; the reference's in-model
    Sigmoid pairs with BCELoss — we use BCE-with-logits)."""

    n_classes: int = 10
    img_dim: int = 256
    n: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, labels, train: bool = True):
        emb = nn.Embed(self.n_classes, self.n_classes, dtype=self.dtype)(labels)
        x = jnp.concatenate([img.reshape(img.shape[0], -1), emb], axis=-1)
        x = nn.leaky_relu(nn.Dense(self.n * 4, dtype=self.dtype)(x), 0.2)
        x = nn.Dense(self.n * 4, dtype=self.dtype)(x)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dense(self.n * 4, dtype=self.dtype)(x)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, dtype=self.dtype)(x)


class DCGenerator(nn.Module):
    """cGAN.py DCGAN generator: z + label -> ConvTranspose stack to
    (32, 32, 1)."""

    n_classes: int = 10
    latent_dim: int = 100
    feat: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, labels, train: bool = True):
        emb = nn.Embed(self.n_classes, self.latent_dim, dtype=self.dtype)(labels)
        x = (z * emb).reshape(-1, 1, 1, self.latent_dim)
        for w, stride in ((self.feat * 4, 4), (self.feat * 2, 2),
                          (self.feat, 2)):
            x = nn.ConvTranspose(
                w, (stride, stride), strides=(stride, stride),
                dtype=self.dtype,
            )(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
        return jnp.tanh(x)  # (B, 32, 32, 1)


class DCDiscriminator(nn.Module):
    """cGAN.py DCGAN discriminator: label embedded as an extra channel
    (cGAN.py label-channel trick)."""

    n_classes: int = 10
    feat: int = 64
    img_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, labels, train: bool = True):
        emb = nn.Embed(
            self.n_classes, self.img_size * self.img_size, dtype=self.dtype
        )(labels)
        label_channel = emb.reshape(-1, self.img_size, self.img_size, 1)
        x = jnp.concatenate([img, label_channel], axis=-1)
        for w in (self.feat, self.feat * 2, self.feat * 4):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=(1, 1),
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype)(x)
