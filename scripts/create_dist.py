"""Constructed-distance dataset builder — reference ``create_dist.py``
equivalent (create_dist.py:65-118).

Bins the two augmented USPS test pools by their distance to the plain
test set, drops ``zeroes`` random bins, fills each remaining bin from a
randomly chosen pool (or min/max-count alternation with ``--minmax``),
and saves ``./data/<name>.npz`` — consumable by
``data/usps.get_gan_loader`` and ``scripts/distance.py <dist> <name>``
— plus the resulting distance histogram under ./plots.

Usage:
    python scripts/create_dist.py [--dist euclid|cosine] [--name N]
                                  [--zeroes K] [--minmax] [--seed S]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    from optwboundeigenval_tpu.analysis.distance import create_dist_dataset
    from optwboundeigenval_tpu.data import usps

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dist", default="cosine", choices=("euclid", "cosine"))
    p.add_argument("--name", default="constructed")
    p.add_argument("--zeroes", type=int, default=5)
    p.add_argument("--minmax", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--plot_dir", default="./plots")
    args = p.parse_args(argv)

    # the reference materializes each set as one giant batch
    # (create_dist.py batch_size=10**9); we stream normal-size padded
    # batches and concatenate the live rows — same arrays, no 1e9 pad
    bs = 4096
    test = usps.get_test_loader(batch_size=bs)
    ref_x = np.concatenate([b["x"][b["w"] > 0] for b in test])
    aug1, aug2 = usps.get_test_loader(batch_size=bs, augment=True)

    def pool(loader):
        xs, ys = [], []
        for b in loader:
            keep = np.asarray(b["w"]) > 0
            xs.append(np.asarray(b["x"])[keep])
            ys.append(np.asarray(b["y"])[keep])
        return np.concatenate(xs), np.concatenate(ys)

    out = create_dist_dataset(
        ref_x, pool(aug1), pool(aug2),
        dist=args.dist, zeroes=args.zeroes, minmax=args.minmax,
        name=args.name, data_dir=args.data_dir, plot_dir=args.plot_dir,
        seed=args.seed,
    )
    with np.load(out) as z:
        print(f"saved {out}: x{z['x'].shape} y{z['y'].shape}")


if __name__ == "__main__":
    main()
