"""MLP conditional-GAN training script — reference ``gan.py``
equivalent (full argparse CLI surface, gan.py:24-46, same defaults).

Trains the label-embedding MLP cGAN on USPS (real files if present,
synthetic stand-in otherwise), reports losses, and saves a generated
dataset consumable by ``data.usps.get_gan_loader``.

Usage:
    python scripts/gan.py --n_epochs 200 --lr 1e-4 --rand 0.3 \
        --swap 0.01 --gen_images 10000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    # flags and defaults mirror the reference CLI (gan.py:24-46)
    p = argparse.ArgumentParser()
    p.add_argument("--n_epochs", type=int, default=200,
                   help="number of epochs of training")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="adam: learning rate")
    p.add_argument("--b1", type=float, default=0.5)
    p.add_argument("--b2", type=float, default=0.999)
    p.add_argument("--weight_decay", type=float, default=2e-5,
                   help="adam: weight decay")
    p.add_argument("--latent_dim", type=int, default=100)
    p.add_argument("--n_classes", type=int, default=10)
    p.add_argument("--img_size", type=int, default=16,
                   help="size of each image dimension")
    p.add_argument("--channels", type=int, default=1,
                   help="number of image channels")
    p.add_argument("--sample_interval", type=int, default=400,
                   help="interval between image samples (0 = never)")
    p.add_argument("--gen_images", type=int, default=10000)
    p.add_argument("--nodes", type=int, default=32,
                   help="nodes in the 1st layer of the network")
    p.add_argument("--train", type=int, default=1,
                   help="whether or not to train the model")
    p.add_argument("--scheduler", type=int, default=1,
                   help="whether or not to use the lr scheduler")
    p.add_argument("--cos", type=int, default=1,
                   help="whether or not to use cosine annealing lr")
    p.add_argument("--rand", type=float, default=0.3,
                   help="amount to randomly fudge labels")
    p.add_argument("--smooth", type=float, default=0.0,
                   help="deterministic label smoothing (extension; "
                        "implies --rand 0 unless --rand is given "
                        "explicitly)")
    p.add_argument("--swap", type=float, default=0.01,
                   help="probability of swapping labels")
    p.add_argument("--d_iter", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="./data/gan_usps.npz")
    p.add_argument("--models_dir", default="./models")
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
    from optwboundeigenval_tpu.train import checkpoints

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
        if args.img_size != x.shape[1]:
            from scipy import ndimage

            zoom = args.img_size / x.shape[1]
            x = ndimage.zoom(x, (1, zoom, zoom, 1), order=1)
        img_shape = (args.img_size, args.img_size, args.channels)
        g = MLPGenerator(n_classes=args.n_classes,
                         latent_dim=args.latent_dim, n=args.nodes,
                         img_shape=img_shape)
        d = MLPDiscriminator(n_classes=args.n_classes, n=args.nodes)
        out = args.out

    # --smooth is an extension that replaces the reference's random
    # label fudging; unless the user explicitly asked for both (an
    # error in train_cgan), smoothing turns the default --rand 0.3 off
    if args.smooth > 0 and "--rand" not in sys.argv:
        args.rand = 0.0

    ckpt = os.path.join(args.models_dir,
                        ("dc_" if args.dc else "") + "cgan_generator.msgpack")
    if args.train:
        g_params, g_state, d_params, hist = train_cgan(
            x, y, g, d,
            n_epochs=args.n_epochs, batch_size=args.batch_size, lr=args.lr,
            b1=args.b1, b2=args.b2, weight_decay=args.weight_decay,
            latent_dim=args.latent_dim,
            n_classes=args.n_classes, d_iter=args.d_iter,
            smooth=args.smooth, swap=args.swap, rand=args.rand,
            cosine_schedule=bool(args.cos and args.scheduler),
            seed=args.seed, sample_interval=args.sample_interval,
        )
        os.makedirs(args.models_dir, exist_ok=True)
        checkpoints.save_checkpoint(
            ckpt, {"params": g_params, "state": g_state}
        )
        print(f"final d_loss={hist[-1][1]:.4f} g_loss={hist[-1][2]:.4f}")
    else:
        # --train 0: load the saved generator (gan.py:40 'train' toggle)
        import jax

        z0 = np.zeros((1, args.latent_dim), np.float32)
        l0 = np.zeros((1,), np.int32)
        g_vars = g.init(jax.random.PRNGKey(0), z0, l0, train=False)
        template = {
            "params": g_vars["params"],
            "state": {k: v for k, v in g_vars.items() if k != "params"},
        }
        payload = checkpoints.restore_like(
            template, checkpoints.load_checkpoint(ckpt)
        )
        g_params, g_state = payload["params"], payload["state"]

    path = generate_dataset(
        g, g_params, g_state, n_images=args.gen_images,
        latent_dim=args.latent_dim, n_classes=args.n_classes,
        seed=args.seed, out_path=out,
    )
    print(f"saved {args.gen_images} generated images to {path}")


if __name__ == "__main__":
    main()
