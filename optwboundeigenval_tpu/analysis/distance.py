"""Distribution distance analysis + constructed-distance test sets.

Capability parity with the reference scripts:
  * ``distance.py`` — nearest-distance histograms between the USPS test
    set and a shifted set: per shifted sample, min Euclidean distance
    (or max cosine similarity) to any test sample, histogrammed;
  * ``create_dist.py`` — builds a synthetic test set by binning two
    candidate pools by their distance-to-test and sampling each bin
    from a randomly chosen pool (or min/max pool alternation), saving
    the dataset and its resulting distance histogram.

TPU-native: the pairwise distance matrix is one jitted matmul-based
computation (the reference used scipy's O(n*m*d) host loop).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pairwise_sq_euclid(a: jax.Array, b: jax.Array) -> jax.Array:
    """(n, d) x (m, d) -> (n, m) squared distances via the expanded
    form (one MXU matmul instead of an O(nmd) loop)."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    return jnp.maximum(a2 + b2.T - 2.0 * (a @ b.T), 0.0)


@jax.jit
def _pairwise_cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return an @ bn.T


def nearest_distances(ref: np.ndarray, samples: np.ndarray,
                      dist: str = "euclid") -> np.ndarray:
    """Per sample: min Euclidean distance (or max cosine similarity) to
    the reference set (distance.py:42-49)."""
    a = jnp.asarray(ref.reshape(len(ref), -1), jnp.float32)
    b = jnp.asarray(samples.reshape(len(samples), -1), jnp.float32)
    if dist == "euclid":
        dm = jnp.sqrt(_pairwise_sq_euclid(a, b))
        return np.asarray(jnp.min(dm, axis=0))
    if dist == "cosine":
        return np.asarray(jnp.max(_pairwise_cosine(a, b), axis=0))
    raise ValueError("Distance not supported.")


def distance_histogram(ref: np.ndarray, samples: np.ndarray,
                       dist: str = "euclid", tag: str = "set",
                       plot_dir: str = "./plots") -> np.ndarray:
    """distance.py histogram output (fixed bin conventions:
    range(19) for euclid, linspace(0.5, 1, 21) for cosine)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dmm = nearest_distances(ref, samples, dist)
    os.makedirs(plot_dir, exist_ok=True)
    if dist == "euclid":
        plt.hist(dmm, bins=range(19), density=True)
        plt.xlabel("Distance")
        plt.ylim(0, 0.3)
    else:
        plt.hist(dmm, bins=np.linspace(0.5, 1, 21), density=True)
        plt.xlabel("Cosine Similarity")
        plt.ylim(0, 15)
    plt.ylabel("Frequency")
    plt.savefig(os.path.join(plot_dir, f"distance_{dist}_{tag}_test.png"))
    plt.clf()
    return dmm


def create_dist_dataset(
    ref_x: np.ndarray,
    pool1: Tuple[np.ndarray, np.ndarray],
    pool2: Tuple[np.ndarray, np.ndarray],
    *,
    dist: str = "euclid",
    zeroes: int = 4,
    minmax: bool = False,
    name: str = "constructed",
    data_dir: str = "./data",
    plot_dir: str = "./plots",
    seed: Optional[int] = None,
):
    """create_dist.py: bin both candidate pools by distance-to-test,
    drop ``zeroes`` random bins, and fill each remaining bin from one
    pool — randomly chosen, or alternating min/max-count pools when
    ``minmax``.  Saves ``<name>.npz`` (x, y) consumable by
    data/usps.get_gan_loader and the resulting distance histogram."""
    rng = np.random.default_rng(seed)
    x1, y1 = pool1
    x2, y2 = pool2
    d1 = nearest_distances(ref_x, x1, dist)
    d2 = nearest_distances(ref_x, x2, dist)

    step = 0.025 if dist == "cosine" else 1.0
    if dist == "cosine":
        bins = np.arange(0.5, 1.0, step)
    else:
        upper = max(d1.max(), d2.max())
        bins = np.arange(0.0, upper + step, step)

    nz_bins = rng.choice(bins, max(len(bins) - zeroes, 1), replace=False)
    nz_bins.sort()

    new_x, new_y = [], []
    for k, lo in enumerate(nz_bins):
        rows1 = np.where((lo <= d1) & (d1 < lo + step))[0]
        rows2 = np.where((lo <= d2) & (d2 < lo + step))[0]
        if minmax:
            pick_min = k % 2 == 0
            use1 = (len(rows1) < len(rows2)) if pick_min else (
                len(rows1) > len(rows2)
            )
        else:
            use1 = rng.integers(2) == 0
        rows, x, y = (rows1, x1, y1) if use1 else (rows2, x2, y2)
        if len(rows) > 0:
            new_x.append(x[rows].reshape(len(rows), -1))
            new_y.append(y[rows])
    if not new_x:
        raise ValueError("no samples fell into the selected bins")
    nx = np.concatenate(new_x)
    ny = np.concatenate(new_y)
    side = int(np.sqrt(nx.shape[1]))
    nx_img = nx.reshape(-1, side, side, 1)

    os.makedirs(data_dir, exist_ok=True)
    out = os.path.join(data_dir, name + ".npz")
    np.savez(out, x=nx_img.astype(np.float32), y=ny)

    distance_histogram(ref_x, nx_img, dist, tag=name, plot_dir=plot_dir)
    return out
