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


def dense_to_torch(kernel: np.ndarray) -> np.ndarray:
    """flax Dense kernel (in, out) -> torch Linear weight (out, in)."""
    return np.ascontiguousarray(kernel.T)


def conv_to_torch(kernel: np.ndarray) -> np.ndarray:
    """flax Conv kernel HWIO -> torch Conv2d weight OIHW."""
    return np.ascontiguousarray(kernel.transpose(3, 2, 0, 1))
