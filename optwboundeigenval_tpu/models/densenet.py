"""DenseNet-BC for CIFAR (depth-40 growth-12 from scratch).

Capability parity with reference ``DenseNet3`` (densenet.py:70-121):
bottleneck dense blocks (BN-ReLU-1x1conv-BN-ReLU-3x3conv with 4x
intermediate width), transition blocks with 0.5 compression + 2x2 avg
pool, 3 dense blocks, global 8x8 average pool, linear classifier.
He-normal conv init (fan-out over kernel*out_channels,
densenet.py:104-107).

TPU-native: NHWC layout, channel concatenation on the last axis (lane
dimension), no in-place ops.  BatchNorm uses flax BatchNorm with
running stats in the ``batch_stats`` collection; curvature evaluations
freeze the running averages (see train/task.py).  BN momentum is 0.9
(flax convention) == torch's default 0.1 — the reference's running-stat
decay rate (nn.BatchNorm2d defaults, densenet.py:19-66).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn

from optwboundeigenval_tpu.models.activations import relu
from optwboundeigenval_tpu.models.norm import BatchNorm
import jax.numpy as jnp


def _conv_init(kernel_size: int, out_ch: int):
    n = kernel_size * kernel_size * out_ch
    return nn.initializers.normal(stddev=math.sqrt(2.0 / n))


class BottleneckBlock(nn.Module):
    out_planes: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = self.out_planes * 4
        out = BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        out = relu(out)
        out = nn.Conv(
            inter, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=_conv_init(1, inter),
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(out)
        out = relu(out)
        out = nn.Conv(
            self.out_planes, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, kernel_init=_conv_init(3, self.out_planes),
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return jnp.concatenate([x, out], axis=-1)


class BasicBlock(nn.Module):
    out_planes: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        out = relu(out)
        out = nn.Conv(
            self.out_planes, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, kernel_init=_conv_init(3, self.out_planes),
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return jnp.concatenate([x, out], axis=-1)


class TransitionBlock(nn.Module):
    out_planes: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        out = relu(out)
        out = nn.Conv(
            self.out_planes, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=_conv_init(1, self.out_planes),
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return nn.avg_pool(out, (2, 2), strides=(2, 2))


class DenseNet3(nn.Module):
    """depth-40 growth-12 BC DenseNet (reference default for CIFAR,
    params/cifar10_DenseNet_*.py)."""

    depth: int = 40
    num_classes: int = 10
    growth_rate: int = 12
    reduction: float = 0.5
    bottleneck: bool = True
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = 2 * self.growth_rate
        n = (self.depth - 4) / 3
        if self.bottleneck:
            n = n / 2
            block = BottleneckBlock
        else:
            block = BasicBlock
        n = int(n)

        out = nn.Conv(
            in_planes, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
            kernel_init=_conv_init(3, in_planes), name="conv1",
        )(x.astype(self.dtype))
        for b in range(3):
            for i in range(n):
                out = block(self.growth_rate, self.drop_rate, self.dtype)(
                    out, train
                )
            in_planes = int(in_planes + n * self.growth_rate)
            if b < 2:
                out_planes = int(math.floor(in_planes * self.reduction))
                out = TransitionBlock(out_planes, self.drop_rate, self.dtype)(
                    out, train
                )
                in_planes = out_planes
        out = BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(out)
        out = relu(out)
        out = nn.avg_pool(out, (8, 8), strides=(8, 8))
        out = out.reshape(out.shape[0], -1)
        return nn.Dense(
            self.num_classes, dtype=self.dtype,
            bias_init=nn.initializers.zeros, name="fc",
        )(out)
