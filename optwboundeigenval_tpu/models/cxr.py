"""Chest x-ray classification heads.

Capability parity with the reference wrappers (dcnn.py:203-329): a
backbone trunk + "transit" block (3x3 conv to 1024 channels, BN, ReLU,
2x2 maxpool with padding) + global maxpool + Linear(1024 -> n_classes):

  * ``MyAlexNet`` / ``MyVggNet16_bn`` / ``MyResNet50`` /
    ``MyDensNet121/161/201`` -> :class:`CXRModel` with the matching
    backbone
  * ``DenseNet121`` (sigmoid-in-model head, dcnn.py:255-265) ->
    :class:`DenseNet121Sigmoid`

Input is NHWC 224x224x3 (the reference's torchvision transforms).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn

from optwboundeigenval_tpu.models.norm import BatchNorm

from optwboundeigenval_tpu.models.activations import relu
import jax.numpy as jnp

from optwboundeigenval_tpu.models import backbones


class TransitHead(nn.Module):
    """transit conv + BN + ReLU + maxpool(2, pad 1) then global maxpool
    and the 1024 -> outnum classifier (dcnn.py:206-217)."""

    outnum: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(1024, (3, 3), padding=(1, 1), dtype=self.dtype,
                    name="transit_conv")(x)
        x = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype,
                         name="transit_bn")(x)
        x = relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding=((1, 1), (1, 1)))
        # global max pool (reference uses fixed-size MaxPool2d(4/16)
        # matched to the 224 input; global max is size-agnostic)
        x = jnp.max(x, axis=(1, 2))
        return nn.Dense(self.outnum, dtype=self.dtype, name="classifier")(x)


class CXRModel(nn.Module):
    """backbone features -> TransitHead (logits out)."""

    backbone: str = "densenet121"
    outnum: int = 14
    dtype: Any = jnp.float32

    def setup(self):
        builders: dict[str, Callable] = {
            "alexnet": lambda: backbones.AlexNetFeatures(dtype=self.dtype),
            "vgg16_bn": lambda: backbones.VGG16BNFeatures(dtype=self.dtype),
            "resnet50": lambda: backbones.ResNet50Features(dtype=self.dtype),
            "densenet121": lambda: backbones.densenet121_features(
                dtype=self.dtype
            ),
            "densenet161": lambda: backbones.densenet161_features(
                dtype=self.dtype
            ),
            "densenet201": lambda: backbones.densenet201_features(
                dtype=self.dtype
            ),
        }
        self.features = builders[self.backbone]()
        self.head = TransitHead(self.outnum, self.dtype)

    def __call__(self, x, train: bool = False):
        return self.head(self.features(x, train), train)


class DenseNet121Sigmoid(nn.Module):
    """Reference ``DenseNet121`` (dcnn.py:255-265): densenet121 trunk,
    global average pool, Linear + Sigmoid INSIDE the model.  Configs
    using it pair with plain BCELoss-style evaluation and
    ``test_func`` without 'sigmoid' (outputs are already probabilities)."""

    class_count: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = backbones.densenet121_features(dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.class_count, dtype=self.dtype, name="classifier")(x)
        return nn.sigmoid(x)
