"""CIFAR-10/100 loaders.

Reference surface (cifar_data.py): dataset selected by name suffix,
empirical mean/std normalization pass (``get_norm``,
cifar_data.py:19-61), augment = RandomAffine translate + HFlip, valid
split 0.2, non-augmented twin.  The reference params import
``cifar10_data``/``cifar100_data`` though the repo ships
``cifar_data.py`` (a documented quirk, SURVEY.md); here one module
serves both via ``name=``.

Zero-egress: reads the standard python pickle batches from
``root/cifar-10-batches-py`` (or ``cifar-100-python``) if present, else
synthetic 32x32x3 stand-ins.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np

from optwboundeigenval_tpu.data.loaders import ArrayLoader, train_valid_split
from optwboundeigenval_tpu.data.synthetic import make_images
from optwboundeigenval_tpu.data.transforms import cifar_augment

SEED = 1226


def _load_pickle_batches(root: str, name: str, train: bool):
    if name == "cifar10":
        d = os.path.join(root, "cifar-10-batches-py")
        files = (
            [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        )
        label_key = b"labels"
    else:
        d = os.path.join(root, "cifar-100-python")
        files = ["train"] if train else ["test"]
        label_key = b"fine_labels"
    if not os.path.isdir(d):
        return None
    xs, ys = [], []
    for f in files:
        with open(os.path.join(d, f), "rb") as fh:
            entry = pickle.load(fh, encoding="bytes")
        xs.append(entry[b"data"])
        ys.extend(entry[label_key])
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return x.astype(np.float32) / 255.0, np.asarray(ys, np.int32)


def load_cifar(root: str = "./data", name: str = "cifar10", train: bool = True):
    out = _load_pickle_batches(root, name, train)
    if out is not None:
        return out
    ncls = 10 if name == "cifar10" else 100
    n = 50000 if train else 10000
    # keep the synthetic stand-in small enough for CI but shaped right
    n = min(n, 4096)
    return make_images(n, shape=(32, 32, 3), n_classes=ncls,
                       seed=SEED if train else SEED + 1)


def get_norm(root: str = "./data", name: str = "cifar10"):
    """Empirical per-channel mean/std over the train set
    (cifar_data.py:19-61)."""
    x, _ = load_cifar(root, name, train=True)
    return x.mean(axis=(0, 1, 2)), x.std(axis=(0, 1, 2))


def get_train_valid_loader(
    batch_size: int = 32,
    augment: bool = True,
    valid_size: float = 0.2,
    root: str = "./data",
    name: str = "cifar10",
    seed: int = SEED,
):
    x, y = load_cifar(root, name, train=True)
    mean, std = x.mean(axis=(0, 1, 2)), x.std(axis=(0, 1, 2))
    x = (x - mean) / std
    tr_idx, va_idx = train_valid_split(len(x), valid_size, seed)
    aug = cifar_augment() if augment else None
    train_loader = ArrayLoader(
        x[tr_idx], y[tr_idx], batch_size, shuffle=True, seed=seed, augment=aug
    )
    valid_loader = ArrayLoader(x[va_idx], y[va_idx], batch_size)
    train_loader_na = ArrayLoader(x[tr_idx], y[tr_idx], batch_size)
    return train_loader, valid_loader, train_loader_na


def get_test_loader(
    batch_size: int = 32, root: str = "./data", name: str = "cifar10"
):
    xtr, _ = load_cifar(root, name, train=True)
    mean, std = xtr.mean(axis=(0, 1, 2)), xtr.std(axis=(0, 1, 2))
    x, y = load_cifar(root, name, train=False)
    x = (x - mean) / std
    return ArrayLoader(x, y, batch_size)
