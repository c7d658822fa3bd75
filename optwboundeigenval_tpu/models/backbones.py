"""ImageNet-style backbone feature extractors (flax, NHWC).

The reference builds its chest-x-ray models from torchvision trunks
(dcnn.py:203-329): AlexNet, VGG16-bn, ResNet50, DenseNet121/161/201
``features``.  These are re-implemented here as flax modules (standard
architectures).  Pretrained ImageNet weights are not downloadable in
this environment; ``load_pretrained_npz`` loads converted weights from
a local ``.npz`` when available (the reference's pretrained-URL loading
with key renames, dnet.py:328-343, becomes an offline conversion).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn

from optwboundeigenval_tpu.models.norm import BatchNorm

from optwboundeigenval_tpu.models.activations import relu
import jax.numpy as jnp


class AlexNetFeatures(nn.Module):
    """torchvision alexnet.features: 5 convs, 3 maxpools -> (B, H/32ish,
    W/32ish, 256)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=(2, 2),
                    dtype=self.dtype)(x)
        x = relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=(2, 2), dtype=self.dtype)(x)
        x = relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        x = relu(x)
        x = nn.Conv(256, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        x = relu(x)
        x = nn.Conv(256, (3, 3), padding=(1, 1), dtype=self.dtype)(x)
        x = relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return x


class VGG16BNFeatures(nn.Module):
    """torchvision vgg16_bn.features -> (B, H/32, W/32, 512)."""

    dtype: Any = jnp.float32
    cfg: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512, "M")

    @nn.compact
    def __call__(self, x, train: bool = False):
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype)(x)
                x = BatchNorm(momentum=0.9, use_running_average=not train,
                                 dtype=self.dtype)(x)
                x = relu(x)
        return x


class _Bottleneck(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_proj = x.shape[-1] != self.filters * 4 or self.strides != (1, 1)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(y)
        y = relu(y)
        # explicit symmetric padding: torch's pad=1 — for the stride-2
        # blocks "SAME" would pad (0,1) on even inputs, a one-pixel
        # sampling shift vs torchvision
        y = nn.Conv(self.filters, (3, 3), strides=self.strides,
                    padding=(1, 1), use_bias=False, dtype=self.dtype)(y)
        y = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(y)
        y = relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype,
                         scale_init=nn.initializers.zeros)(y)
        if needs_proj:
            residual = nn.Conv(self.filters * 4, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype)(x)
            residual = BatchNorm(momentum=0.9, use_running_average=not train,
                                    dtype=self.dtype)(residual)
        return relu(residual + y)


class ResNet50Features(nn.Module):
    """torchvision resnet50 without avgpool/fc -> (B, H/32, W/32, 2048)."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=(3, 3), use_bias=False,
                    dtype=self.dtype)(x)
        x = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        x = relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = (2, 2) if (i > 0 and b == 0) else (1, 1)
                x = _Bottleneck(64 * 2**i, strides, self.dtype)(x, train)
        return x


class DenseNetFeatures(nn.Module):
    """ImageNet DenseNet features (densenet121 default: blocks
    (6, 12, 24, 16), growth 32, init 64) -> (B, H/32, W/32, C_out).
    Matches torchvision densenet feature extractors used by the chest
    x-ray wrappers (dcnn.py:269-329) and the custom fork (dnet.py)."""

    block_config: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=(3, 3), use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        x = relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for _ in range(n_layers):
                y = BatchNorm(momentum=0.9, use_running_average=not train,
                                 dtype=self.dtype)(x)
                y = relu(y)
                y = nn.Conv(self.bn_size * self.growth_rate, (1, 1),
                            use_bias=False, dtype=self.dtype)(y)
                y = BatchNorm(momentum=0.9, use_running_average=not train,
                                 dtype=self.dtype)(y)
                y = relu(y)
                y = nn.Conv(self.growth_rate, (3, 3), padding="SAME",
                            use_bias=False, dtype=self.dtype)(y)
                x = jnp.concatenate([x, y], axis=-1)
            features += n_layers * self.growth_rate
            if i < len(self.block_config) - 1:
                x = BatchNorm(momentum=0.9, use_running_average=not train,
                                 dtype=self.dtype)(x)
                x = relu(x)
                x = nn.Conv(features // 2, (1, 1), use_bias=False,
                            dtype=self.dtype)(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                features = features // 2
        x = BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return relu(x)


def densenet121_features(**kw):
    return DenseNetFeatures(block_config=(6, 12, 24, 16), growth_rate=32,
                            num_init_features=64, **kw)  # out 1024


def densenet161_features(**kw):
    return DenseNetFeatures(block_config=(6, 12, 36, 24), growth_rate=48,
                            num_init_features=96, **kw)  # out 2208


def densenet169_features(**kw):
    return DenseNetFeatures(block_config=(6, 12, 32, 32), growth_rate=32,
                            num_init_features=64, **kw)  # out 1664


def densenet201_features(**kw):
    return DenseNetFeatures(block_config=(6, 12, 48, 32), growth_rate=32,
                            num_init_features=64, **kw)  # out 1920


def load_pretrained_npz(params, path: str, prefix: str = None):
    """Overlay converted pretrained weights from a local npz whose keys
    are '/'-joined param paths.  Missing keys keep their random init —
    the offline analog of the reference's tolerant pretrained loading
    (dnet.py:328-343, opt.py:1041-1059).

    Accepts either a bare params tree with bare npz keys
    (``Conv_0/kernel``) or a full variables dict with namespaced keys
    (``params/Conv_0/kernel``, ``batch_stats/BatchNorm_0/mean``) — the
    format ``scripts/convert_torch_weights.py`` emits, which carries the
    BatchNorm running statistics pretrained trunks need.

    ``prefix`` names the submodule the trunk lives under in the target
    tree (e.g. ``"features"`` for CXRModel, whose params are
    ``params/features/Conv_0/...`` while the npz holds
    ``params/Conv_0/...``) — the reference's ``encoder. -> features.``
    rename tolerance (opt.py:1052-1056) expressed as scoping."""
    import numpy as np

    from flax.traverse_util import flatten_dict, unflatten_dict

    loaded = dict(np.load(path))
    flat = flatten_dict(params, sep="/")
    for k in list(flat):
        candidates = [k, k.removeprefix("params/"), "params/" + k]
        if prefix:
            for cand in list(candidates):
                parts = cand.split("/")
                if prefix in parts:
                    parts.remove(prefix)
                    candidates.append("/".join(parts))
        for key in candidates:
            if key in loaded and loaded[key].shape == flat[k].shape:
                flat[k] = jnp.asarray(loaded[key])
                break
    return unflatten_dict(flat, sep="/")
