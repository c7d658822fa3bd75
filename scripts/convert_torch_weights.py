"""Offline torch→npz pretrained-weight converter for the backbone
feature trunks (models/backbones.py).

The reference's chest-x-ray models start from pretrained torchvision
trunks loaded over the network with tolerant key renames
(dnet.py:328-343: strip ``module.``, regex ``norm.1 → norm1``;
dcnn.py:269-278).  This environment has no egress, so pretrained use
becomes a two-step: convert a torch ``state_dict`` (a local ``.pt``
file, or any mapping) into a '/'-joined ``.npz`` here, then overlay it
with ``backbones.load_pretrained_npz``.

Layout conversions (utils/torch_interop): Conv2d OIHW → HWIO;
BatchNorm weight/bias/running_mean/running_var →
params.scale/params.bias/batch_stats.mean/batch_stats.var.  Keys are
emitted namespaced (``params/...``, ``batch_stats/...``) so the running
statistics ride along.

Usage:
  python scripts/convert_torch_weights.py model.pt out.npz --arch densenet121
Supported archs: densenet121/161/169/201, vgg16_bn, alexnet, resnet50.
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict, Mapping

import numpy as np

BLOCK_CONFIGS = {
    "densenet121": (6, 12, 24, 16),
    "densenet161": (6, 12, 36, 24),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}


def normalize_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The reference's tolerant key cleanup (dnet.py:328-343): strip
    DataParallel ``module.`` prefixes and rename the legacy dotted
    torchvision layer names (``norm.1`` → ``norm1``)."""
    pat = re.compile(r"(norm|conv|relu|pool)\.(\d+)")
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        k = pat.sub(lambda m: m.group(1) + m.group(2), k)
        out[k] = np.asarray(v)
    return out


class _Emitter:
    """Assigns flax auto-names (Conv_0, BatchNorm_1, ...) in module
    CREATION order — which for the nn.compact backbones is exactly the
    call order of their ``__call__`` bodies."""

    def __init__(self):
        self.out: Dict[str, np.ndarray] = {}
        self.counters: Dict[str, int] = {}

    def _next(self, cls: str) -> str:
        i = self.counters.get(cls, 0)
        self.counters[cls] = i + 1
        return f"{cls}_{i}"

    def conv(self, sd, torch_prefix: str):
        from optwboundeigenval_tpu.utils.torch_interop import conv_from_torch

        name = self._next("Conv")
        w = sd[f"{torch_prefix}.weight"]
        cv = conv_from_torch(w, sd.get(f"{torch_prefix}.bias"))
        self.out[f"params/{name}/kernel"] = cv["kernel"]
        if "bias" in cv:
            self.out[f"params/{name}/bias"] = cv["bias"]

    def bn(self, sd, torch_prefix: str):
        name = self._next("BatchNorm")
        self.out[f"params/{name}/scale"] = sd[f"{torch_prefix}.weight"]
        self.out[f"params/{name}/bias"] = sd[f"{torch_prefix}.bias"]
        self.out[f"batch_stats/{name}/mean"] = sd[f"{torch_prefix}.running_mean"]
        self.out[f"batch_stats/{name}/var"] = sd[f"{torch_prefix}.running_var"]


def convert_densenet_features(sd, arch: str = "densenet121"):
    """torchvision/dnet densenet ``features.*`` state_dict →
    backbones.DenseNetFeatures npz mapping.

    Walk order mirrors DenseNetFeatures.__call__ (backbones.py:126-157):
    conv0+norm0, then per dense-layer (norm1, conv1, norm2, conv2), per
    transition (norm, conv), final norm5."""
    sd = normalize_keys(sd)
    block_config = BLOCK_CONFIGS[arch]
    e = _Emitter()
    e.conv(sd, "features.conv0")
    e.bn(sd, "features.norm0")
    for b, n_layers in enumerate(block_config, start=1):
        for l in range(1, n_layers + 1):
            p = f"features.denseblock{b}.denselayer{l}"
            e.bn(sd, f"{p}.norm1")
            e.conv(sd, f"{p}.conv1")
            e.bn(sd, f"{p}.norm2")
            e.conv(sd, f"{p}.conv2")
        if b < len(block_config):
            e.bn(sd, f"features.transition{b}.norm")
            e.conv(sd, f"features.transition{b}.conv")
    e.bn(sd, "features.norm5")
    return e.out


def convert_dcnn_densenet121(sd):
    """Full dcnn.DenseNet121 (dcnn.py:255-265) state_dict →
    models.cxr.DenseNet121Sigmoid npz mapping: the dnet densenet121
    trunk under the flax auto-name ``DenseNetFeatures_0`` plus the
    ``classifier`` Dense (torch ``densenet121.classifier.0`` — the
    Sequential(Linear, Sigmoid) head; Sigmoid has no params)."""
    sd = {k.removeprefix("densenet121."): np.asarray(v) for k, v in sd.items()}
    feats = convert_densenet_features(sd, "densenet121")
    out = {
        k.replace("params/", "params/DenseNetFeatures_0/").replace(
            "batch_stats/", "batch_stats/DenseNetFeatures_0/"
        ): v
        for k, v in feats.items()
    }
    out["params/classifier/kernel"] = sd["classifier.0.weight"].T
    out["params/classifier/bias"] = sd["classifier.0.bias"]
    return out


def convert_vgg16_bn_features(sd):
    """torchvision vgg16_bn ``features.*`` (Sequential indices) →
    backbones.VGG16BNFeatures npz mapping.  The Sequential is
    conv,bn,relu triples with maxpools interleaved — walk indices in
    order and emit on conv/bn weights."""
    sd = normalize_keys(sd)
    e = _Emitter()
    idx = 0
    while f"features.{idx}.weight" in sd or f"features.{idx}.running_mean" in sd or idx < 60:
        wkey = f"features.{idx}.weight"
        if wkey in sd:
            if f"features.{idx}.running_mean" in sd:
                e.bn(sd, f"features.{idx}")
            elif sd[wkey].ndim == 4:
                e.conv(sd, f"features.{idx}")
        idx += 1
        if idx > 100:
            break
    return e.out


def convert_alexnet_features(sd):
    """torchvision alexnet ``features.*`` → backbones.AlexNetFeatures."""
    sd = normalize_keys(sd)
    e = _Emitter()
    for idx in range(20):
        wkey = f"features.{idx}.weight"
        if wkey in sd and sd[wkey].ndim == 4:
            e.conv(sd, f"features.{idx}")
    return e.out


def convert_resnet50_features(sd):
    """torchvision resnet50 (minus avgpool/fc) →
    backbones.ResNet50Features.

    Unlike the inline-compact backbones, each bottleneck is a NESTED
    flax submodule (``_Bottleneck_{k}``) with its OWN auto-name
    counters (backbones.py:70-111), so the emitter is scoped per
    block: stem conv+bn at top level, then per block conv1/bn1,
    conv2/bn2, conv3/bn3, and the downsample conv+bn LAST (created
    inside the needs_proj branch → ``Conv_3``/``BatchNorm_3``)."""
    sd = normalize_keys(sd)
    e = _Emitter()
    e.conv(sd, "conv1")
    e.bn(sd, "bn1")
    out = dict(e.out)
    block = 0
    for stage, n_blocks in enumerate((3, 4, 6, 3), start=1):
        for b in range(n_blocks):
            p = f"layer{stage}.{b}"
            be = _Emitter()
            be.conv(sd, f"{p}.conv1")
            be.bn(sd, f"{p}.bn1")
            be.conv(sd, f"{p}.conv2")
            be.bn(sd, f"{p}.bn2")
            be.conv(sd, f"{p}.conv3")
            be.bn(sd, f"{p}.bn3")
            if f"{p}.downsample.0.weight" in sd:
                be.conv(sd, f"{p}.downsample.0")
                be.bn(sd, f"{p}.downsample.1")
            for k, v in be.out.items():
                coll, rest = k.split("/", 1)
                out[f"{coll}/_Bottleneck_{block}/{rest}"] = v
            block += 1
    return out


CONVERTERS = {
    **{arch: (lambda sd, a=arch: convert_densenet_features(sd, a))
       for arch in BLOCK_CONFIGS},
    "vgg16_bn": convert_vgg16_bn_features,
    "alexnet": convert_alexnet_features,
    "resnet50": convert_resnet50_features,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="torch .pt/.pth state_dict file")
    ap.add_argument("output", help="output .npz path")
    ap.add_argument("--arch", required=True, choices=sorted(CONVERTERS))
    args = ap.parse_args(argv)

    import torch

    sd = torch.load(args.input, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]  # reference checkpoint convention (opt.py:1050)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    out = CONVERTERS[args.arch](sd)
    np.savez(args.output, **out)
    print(f"wrote {args.output}: {len(out)} arrays ({args.arch})")


if __name__ == "__main__":
    main(sys.argv[1:])
