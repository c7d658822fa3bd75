"""Nearest-distance histogram script — reference ``distance.py``
equivalent.

Compares the USPS test set against a shifted set (augmented variants,
MNIST-16, or a saved GAN/constructed dataset) by min-Euclidean
distance or max-cosine similarity, saving the histogram under ./plots.

Usage:
    python scripts/distance.py [euclid|cosine] [Aug1|Aug2|MNIST|GAN|<name>]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(dist: str = "euclid", data: str = "Aug2"):
    from optwboundeigenval_tpu.analysis.distance import distance_histogram
    from optwboundeigenval_tpu.data import usps

    # the reference materializes each set as one giant batch
    # (distance.py batch_size=10**9); we stream normal-size padded
    # batches and concatenate the live rows — same arrays, and no
    # padding blow-up from ArrayLoader(pad=True) at a 1e9 batch size
    bs = 4096
    test = usps.get_test_loader(batch_size=bs)
    ref_x = np.concatenate([b["x"][b["w"] > 0] for b in test])

    if data in ("Aug1", "Aug2"):
        aug = usps.get_test_loader(batch_size=bs, augment=True)
        loader = aug[0 if data == "Aug1" else 1]
    elif data == "MNIST":
        loader = usps.get_mnist_loader(batch_size=bs)
    elif data == "GAN":
        loader = usps.get_gan_loader(batch_size=bs, file="gan_usps.npz")
    elif data == "GAN2":
        loader = usps.get_gan_loader(batch_size=bs, file="cgan_usps.npz")
    elif "constructed" in data:
        loader = usps.get_gan_loader(batch_size=bs, file=data + ".npz")
    else:
        raise ValueError("Data not supported.")
    shifted_x = np.concatenate([b["x"][b["w"] > 0] for b in loader])

    dmm = distance_histogram(ref_x, shifted_x, dist, tag=data)
    print(f"{data}/{dist}: mean nearest {'similarity' if dist == 'cosine' else 'distance'} "
          f"= {dmm.mean():.4f}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "euclid",
        sys.argv[2] if len(sys.argv) > 2 else "Aug2",
    )
