"""Layout conversion helpers for importing torch ``state_dict`` arrays
into flax parameter trees.

The reference ecosystem ships torch weights (pretrained trunks,
dnet.py:328-343; checkpoints, opt.py:1041-1059).  These pure-numpy
helpers express the layout mapping once:

  * torch ``nn.Linear.weight`` is ``(out, in)``; flax Dense kernels are
    ``(in, out)``.
  * torch ``nn.Conv2d.weight`` is OIHW; flax Conv kernels are HWIO.
  * a Dense that consumes a FLATTENED conv feature map sees its input
    dimension ordered CHW in torch but HWC in flax (NHWC layout) — the
    columns must be permuted, not just transposed.

No torch import here — callers hand in numpy arrays (e.g. from an
``np.savez`` of a state_dict), keeping the compute path torch-free.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def dense_from_torch(
    weight: np.ndarray, bias: Optional[np.ndarray] = None
) -> Dict[str, np.ndarray]:
    """torch Linear (out, in) -> flax Dense {(in, out) kernel, bias}."""
    out = {"kernel": np.ascontiguousarray(weight.T)}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def conv_from_torch(
    weight: np.ndarray, bias: Optional[np.ndarray] = None
) -> Dict[str, np.ndarray]:
    """torch Conv2d OIHW -> flax Conv HWIO."""
    out = {"kernel": np.ascontiguousarray(weight.transpose(2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def dense_after_flatten_from_torch(
    weight: np.ndarray,
    bias: Optional[np.ndarray],
    chw: Tuple[int, int, int],
) -> Dict[str, np.ndarray]:
    """torch Linear consuming a flattened (C, H, W) feature map -> flax
    Dense consuming the same map flattened (H, W, C).

    ``weight`` is (out, C*H*W) with columns in CHW order; the returned
    kernel is (H*W*C, out) with rows in HWC order, so
    ``flax_dense(flatten_hwc(x)) == torch_linear(flatten_chw(x))``.
    """
    c, h, w = chw
    out_dim = weight.shape[0]
    assert weight.shape[1] == c * h * w, (weight.shape, chw)
    w_hwc = (
        weight.reshape(out_dim, c, h, w)
        .transpose(0, 2, 3, 1)  # (out, H, W, C)
        .reshape(out_dim, h * w * c)
    )
    out = {"kernel": np.ascontiguousarray(w_hwc.T)}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def normalize_state_dict_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The reference's tolerant checkpoint-key cleanup (opt.py:1041-1059,
    dnet.py:328-343): unwrap ``{'state_dict': ...}`` nesting, strip
    DataParallel ``module.`` prefixes, rename ``encoder.`` to
    ``features.`` and legacy dotted layer names (``norm.1`` → ``norm1``)."""
    import re

    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    pat = re.compile(r"(norm|conv|relu|pool)\.(\d+)")
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if k.startswith("encoder."):
            k = "features." + k.removeprefix("encoder.")
        k = pat.sub(lambda m: m.group(1) + m.group(2), k)
        out[k] = np.asarray(v)
    return out


def convert_forestnet_state_dict(sd) -> Dict[str, dict]:
    """Reference Forest ``Net`` state_dict (forest_data.py:75-89) →
    models.ForestNet params tree."""
    sd = normalize_state_dict_keys(sd)
    return {
        name: dense_from_torch(sd[f"{name}.weight"], sd[f"{name}.bias"])
        for name in ("fc1", "fc2", "fc3")
    }


def convert_cnnusps_state_dict(sd) -> Dict[str, dict]:
    """Reference USPS ``CNN`` state_dict (usps_data.py:298-336) →
    models.CNNUSPS params tree (NHWC layouts; the flattened fc1 input
    is permuted from torch's CHW order to flax's HWC)."""
    sd = normalize_state_dict_keys(sd)
    return {
        "Conv_0": conv_from_torch(sd["conv1.weight"], sd["conv1.bias"]),
        "Conv_1": conv_from_torch(sd["conv2.weight"], sd["conv2.bias"]),
        "Conv_2": conv_from_torch(sd["conv3.weight"], sd["conv3.bias"]),
        "Dense_0": dense_after_flatten_from_torch(
            sd["fc1.weight"], sd["fc1.bias"], chw=(32, 2, 2)
        ),
        "Dense_1": dense_from_torch(sd["fc2.weight"], sd["fc2.bias"]),
    }


def bn_from_torch(
    sd: Dict[str, np.ndarray], prefix: str
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """torch BatchNorm2d ``{weight,bias,running_mean,running_var}`` →
    flax ``({scale, bias}, {mean, var})`` (params, batch_stats)."""
    return (
        {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        },
        {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        },
    )


def convert_densenet3_state_dict(
    sd, depth: int = 40, bottleneck: bool = True
) -> Tuple[Dict[str, dict], Dict[str, dict]]:
    """Reference CIFAR ``DenseNet3`` state_dict (densenet.py:70-121) →
    (params, batch_stats) trees for models.DenseNet3.

    Key map: ``block{b+1}.layer.{i}`` → ``{Bottleneck,Basic}Block_{b*n+i}``
    (flax auto-numbering is global across the three dense blocks),
    ``trans{t}`` → ``TransitionBlock_{t-1}``, the final ``bn1`` →
    top-level ``BatchNorm_0``, ``fc`` → ``fc``; convs are OIHW → HWIO.
    """
    sd = normalize_state_dict_keys(sd)
    n = (depth - 4) / 3
    if bottleneck:
        n = n / 2
    n = int(n)
    block_cls = "BottleneckBlock" if bottleneck else "BasicBlock"

    params: Dict[str, dict] = {"conv1": conv_from_torch(sd["conv1.weight"])}
    stats: Dict[str, dict] = {}
    for b in range(3):
        for i in range(n):
            t = f"block{b + 1}.layer.{i}"
            f = f"{block_cls}_{b * n + i}"
            bn_p, bn_s = bn_from_torch(sd, f"{t}.bn1")
            p = {"BatchNorm_0": bn_p, "Conv_0": conv_from_torch(sd[f"{t}.conv1.weight"])}
            s = {"BatchNorm_0": bn_s}
            if bottleneck:
                bn_p2, bn_s2 = bn_from_torch(sd, f"{t}.bn2")
                p["BatchNorm_1"] = bn_p2
                p["Conv_1"] = conv_from_torch(sd[f"{t}.conv2.weight"])
                s["BatchNorm_1"] = bn_s2
            params[f], stats[f] = p, s
        if b < 2:
            t = f"trans{b + 1}"
            f = f"TransitionBlock_{b}"
            bn_p, bn_s = bn_from_torch(sd, f"{t}.bn1")
            params[f] = {
                "BatchNorm_0": bn_p,
                "Conv_0": conv_from_torch(sd[f"{t}.conv1.weight"]),
            }
            stats[f] = {"BatchNorm_0": bn_s}
    bn_p, bn_s = bn_from_torch(sd, "bn1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn_p, bn_s
    params["fc"] = dense_from_torch(sd["fc.weight"], sd["fc.bias"])
    return params, stats


def dense_to_torch(kernel: np.ndarray) -> np.ndarray:
    """flax Dense kernel (in, out) -> torch Linear weight (out, in)."""
    return np.ascontiguousarray(kernel.T)


def conv_to_torch(kernel: np.ndarray) -> np.ndarray:
    """flax Conv kernel HWIO -> torch Conv2d weight OIHW."""
    return np.ascontiguousarray(kernel.transpose(3, 2, 0, 1))


def dense_after_flatten_to_torch(
    kernel: np.ndarray, chw: Tuple[int, int, int]
) -> np.ndarray:
    """Inverse of :func:`dense_after_flatten_from_torch`: flax Dense
    kernel (H*W*C, out) consuming an HWC-flattened map -> torch Linear
    weight (out, C*H*W) consuming the CHW flattening."""
    c, h, w = chw
    out_dim = kernel.shape[1]
    assert kernel.shape[0] == c * h * w, (kernel.shape, chw)
    w_chw = (
        kernel.T.reshape(out_dim, h, w, c)
        .transpose(0, 3, 1, 2)  # (out, C, H, W)
        .reshape(out_dim, c * h * w)
    )
    return np.ascontiguousarray(w_chw)


def forestnet_to_state_dict(params) -> Dict[str, np.ndarray]:
    """models.ForestNet params tree -> reference Forest ``Net``
    state_dict arrays (the inverse of convert_forestnet_state_dict, so
    checkpoints migrate in BOTH directions)."""
    sd = {}
    for name in ("fc1", "fc2", "fc3"):
        sd[f"{name}.weight"] = dense_to_torch(np.asarray(params[name]["kernel"]))
        sd[f"{name}.bias"] = np.asarray(params[name]["bias"])
    return sd


def cnnusps_to_state_dict(params) -> Dict[str, np.ndarray]:
    """models.CNNUSPS params tree -> reference USPS ``CNN`` state_dict
    arrays (inverse of convert_cnnusps_state_dict)."""
    sd = {}
    for flax_name, torch_name in (
        ("Conv_0", "conv1"), ("Conv_1", "conv2"), ("Conv_2", "conv3")
    ):
        sd[f"{torch_name}.weight"] = conv_to_torch(
            np.asarray(params[flax_name]["kernel"]))
        sd[f"{torch_name}.bias"] = np.asarray(params[flax_name]["bias"])
    sd["fc1.weight"] = dense_after_flatten_to_torch(
        np.asarray(params["Dense_0"]["kernel"]), chw=(32, 2, 2))
    sd["fc1.bias"] = np.asarray(params["Dense_0"]["bias"])
    sd["fc2.weight"] = dense_to_torch(np.asarray(params["Dense_1"]["kernel"]))
    sd["fc2.bias"] = np.asarray(params["Dense_1"]["bias"])
    return sd
