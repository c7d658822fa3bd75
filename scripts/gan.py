"""MLP conditional-GAN training script — reference ``gan.py``
equivalent (argparse CLI, gan.py:24-45).

Trains the label-embedding MLP cGAN on USPS (real files if present,
synthetic stand-in otherwise), reports discriminator test accuracy,
and saves a generated dataset consumable by
``data.usps.get_gan_loader``.

Usage:
    python scripts/gan.py --n_epochs 50 --lr 2e-4 --smooth 0.1 \
        --swap 0.05 --cos --gen_images 2048
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--b1", type=float, default=0.5)
    p.add_argument("--b2", type=float, default=0.999)
    p.add_argument("--latent_dim", type=int, default=100)
    p.add_argument("--n_classes", type=int, default=10)
    p.add_argument("--nodes", type=int, default=128)
    p.add_argument("--d_iter", type=int, default=1)
    p.add_argument("--smooth", type=float, default=0.0)
    p.add_argument("--swap", type=float, default=0.0)
    p.add_argument("--cos", action="store_true",
                   help="cosine LR schedule (else constant)")
    p.add_argument("--gen_images", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="./data/gan_usps.npz")
    p.add_argument("--dc", action="store_true",
                   help="use the DC-cGAN (cGAN.py equivalent) at 32x32")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from optwboundeigenval_tpu.analysis.gan_train import (
        generate_dataset,
        train_cgan,
    )
    from optwboundeigenval_tpu.data import usps
    from optwboundeigenval_tpu.models.gan import (
        DCDiscriminator,
        DCGenerator,
        MLPDiscriminator,
        MLPGenerator,
    )

    x, y = usps.load_usps(train=True)
    # normalize to [-1, 1] for the tanh generator (gan.py transform)
    x = (x - 0.5) / 0.5
    if args.dc:
        # DC-cGAN works at 32x32 (cGAN.py)
        from scipy import ndimage

        x = ndimage.zoom(x, (1, 2, 2, 1), order=1)
        g = DCGenerator(n_classes=args.n_classes,
                        latent_dim=args.latent_dim)
        d = DCDiscriminator(n_classes=args.n_classes)
        out = args.out.replace("gan_usps", "cgan_usps")
    else:
        g = MLPGenerator(n_classes=args.n_classes,
                         latent_dim=args.latent_dim, n=args.nodes)
        d = MLPDiscriminator(n_classes=args.n_classes, n=args.nodes)
        out = args.out

    g_params, g_state, d_params, hist = train_cgan(
        x, y, g, d,
        n_epochs=args.n_epochs, batch_size=args.batch_size, lr=args.lr,
        b1=args.b1, b2=args.b2, latent_dim=args.latent_dim,
        n_classes=args.n_classes, d_iter=args.d_iter,
        smooth=args.smooth, swap=args.swap, cosine_schedule=args.cos,
        seed=args.seed,
    )
    path = generate_dataset(
        g, g_params, g_state, n_images=args.gen_images,
        latent_dim=args.latent_dim, n_classes=args.n_classes,
        seed=args.seed, out_path=out,
    )
    print(f"saved {args.gen_images} generated images to {path}")
    print(f"final d_loss={hist[-1][1]:.4f} g_loss={hist[-1][2]:.4f}")


if __name__ == "__main__":
    main()
