"""Conditional-GAN training — TPU-native rewrite of the reference's
standalone scripts (gan.py main loop, cGAN.py main loop).

One jitted step performs the generator update and ``d_iter``
discriminator updates (gan.py d_iter loop); label smoothing and
real/fake label swapping tricks (gan.py smooth/swap args) are applied
inside the step.  Generated datasets are saved as ``.npz`` consumed by
``data.usps.get_gan_loader``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def bce_logits(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def train_cgan(
    x: np.ndarray,
    y: np.ndarray,
    generator,
    discriminator,
    *,
    n_epochs: int = 50,
    batch_size: int = 64,
    lr: float = 2e-4,
    b1: float = 0.5,
    b2: float = 0.999,
    latent_dim: int = 100,
    n_classes: int = 10,
    d_iter: int = 1,
    smooth: float = 0.0,
    swap: float = 0.0,
    rand: float = 0.0,
    weight_decay: float = 0.0,
    cosine_schedule: bool = False,
    seed: int = 0,
    log_every: int = 10,
    sample_interval: int = 0,
    sample_dir: str = "./images",
):
    """Returns (g_params, g_state, d_params, history).

    Label tricks (gan.py:174-184): ``rand`` draws the real target from
    U(1-rand, 1) and the fake target from U(0, rand) per example;
    ``smooth`` is a deterministic EXTENSION (real target 1-smooth; not
    in the reference) and is mutually exclusive with ``rand``;
    ``swap`` exchanges the whole batch's real/fake targets with that
    probability (ONE draw per batch, matching the reference).  The
    generator loss targets the post-fudge/post-swap ``valid``
    (gan.py:205).
    ``weight_decay`` is Adam weight decay (gan.py:30 --weight_decay);
    ``sample_interval`` > 0 saves a generator sample grid npz every
    that many batches (gan.py:36 --sample_interval / sample_image)."""
    if rand > 0 and smooth > 0:
        raise ValueError(
            "rand and smooth are mutually exclusive label tricks; "
            "pass rand=0 to use deterministic smoothing"
        )
    rng = jax.random.PRNGKey(seed)
    rng, gk, dk = jax.random.split(rng, 3)
    z0 = jnp.zeros((batch_size, latent_dim))
    l0 = jnp.zeros((batch_size,), jnp.int32)
    x0 = jnp.zeros((batch_size,) + x.shape[1:])

    g_vars = generator.init(gk, z0, l0, train=True)
    d_vars = discriminator.init({"params": dk, "dropout": dk}, x0, l0,
                                train=True)
    g_params, g_state = g_vars["params"], {
        k: v for k, v in g_vars.items() if k != "params"
    }
    d_params = d_vars["params"]

    if cosine_schedule:
        sched = optax.cosine_decay_schedule(lr, n_epochs * max(len(x) //
                                                               batch_size, 1))
    else:
        sched = lr

    def make_tx():
        if weight_decay > 0:
            return optax.adamw(sched, b1=b1, b2=b2,
                               weight_decay=weight_decay)
        return optax.adam(sched, b1=b1, b2=b2)

    g_tx = make_tx()
    d_tx = make_tx()
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_params)

    def g_apply(params, state, z, labels):
        out, updates = generator.apply(
            {"params": params, **state}, z, labels, train=True,
            mutable=["batch_stats"],
        )
        return out, updates

    def d_apply(params, img, labels, rng):
        return discriminator.apply(
            {"params": params}, img, labels, train=True,
            rngs={"dropout": rng},
        )

    @jax.jit
    def step(g_params, g_state, g_opt, d_params, d_opt, real, labels, rng):
        rng, zk, lk, dk1, dk2, sk, rk1, rk2 = jax.random.split(rng, 8)
        z = jax.random.normal(zk, (batch_size, latent_dim))
        gen_labels = jax.random.randint(lk, (batch_size,), 0, n_classes)

        if rand > 0:
            # per-example fudged targets (gan.py:174-178)
            valid = jax.random.uniform(
                rk1, (batch_size, 1), minval=1.0 - rand, maxval=1.0
            )
            fake = jax.random.uniform(
                rk2, (batch_size, 1), minval=0.0, maxval=rand
            )
        else:
            valid = jnp.full((batch_size, 1), 1.0 - smooth)
            fake = jnp.zeros((batch_size, 1))
        if swap > 0:
            # whole-batch swap with probability ``swap`` (gan.py:183-184)
            flip = jax.random.bernoulli(sk, swap)
            valid_d = jnp.where(flip, fake, valid)
            fake_d = jnp.where(flip, valid, fake)
        else:
            valid_d, fake_d = valid, fake

        # generator update — the loss targets the SAME fudged/swapped
        # ``valid`` the discriminator sees (gan.py:205: g_loss =
        # adversarial_loss(validity, valid) after the rand/swap block),
        # so on a swapped batch the generator trains toward the fake
        # target, exactly like the reference.
        def g_loss_fn(gp):
            imgs, updates = g_apply(gp, g_state, z, gen_labels)
            logits = d_apply(d_params, imgs, gen_labels, dk1)
            return bce_logits(logits, valid_d), (imgs, updates)

        (g_loss, (gen_imgs, g_updates)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params)
        g_up, g_opt = g_tx.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_up)
        new_g_state = {**g_state, **g_updates}

        # discriminator updates (d_iter times — gan.py d_iter loop)
        def d_loss_fn(dp):
            real_logits = d_apply(dp, real, labels, dk1)
            fake_logits = d_apply(dp, jax.lax.stop_gradient(gen_imgs),
                                  gen_labels, dk2)
            return (bce_logits(real_logits, valid_d)
                    + bce_logits(fake_logits, fake_d)) / 2

        d_loss = jnp.zeros(())
        for _ in range(d_iter):
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_up, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_up)

        return g_params, new_g_state, g_opt, d_params, d_opt, g_loss, d_loss, rng

    def save_sample(batches_done):
        # sample grid: one row per class (reference sample_image,
        # gan.py:149-160), saved as npz (no PIL dependency)
        k = jax.random.PRNGKey(seed + batches_done)
        zs = jax.random.normal(k, (n_classes * n_classes, latent_dim))
        ls = jnp.repeat(jnp.arange(n_classes), n_classes)
        imgs = generator.apply(
            {"params": g_params, **g_state}, zs, ls, train=False
        )
        os.makedirs(sample_dir, exist_ok=True)
        np.savez(os.path.join(sample_dir, f"{batches_done}.npz"),
                 imgs=np.asarray(imgs), labels=np.asarray(ls))

    history = []
    nb = len(x) // batch_size
    order_rng = np.random.default_rng(seed)
    batches_done = 0
    for epoch in range(n_epochs):
        order = order_rng.permutation(len(x))[: nb * batch_size]
        g_losses, d_losses = [], []
        for i in range(nb):
            take = order[i * batch_size : (i + 1) * batch_size]
            real = jnp.asarray(x[take])
            labels = jnp.asarray(y[take].astype(np.int32))
            (g_params, g_state, g_opt, d_params, d_opt, gl, dl, rng) = step(
                g_params, g_state, g_opt, d_params, d_opt, real, labels, rng
            )
            g_losses.append(float(gl))
            d_losses.append(float(dl))
            batches_done += 1
            if sample_interval and batches_done % sample_interval == 0:
                save_sample(batches_done)
        history.append((epoch, float(np.mean(d_losses)),
                        float(np.mean(g_losses))))
        if epoch % log_every == 0:
            print(f"{epoch}\t{history[-1][1]:f}\t{history[-1][2]:f}")
    return g_params, g_state, d_params, history


def generate_dataset(
    generator, g_params, g_state, *, n_images: int = 2048,
    latent_dim: int = 100, n_classes: int = 10, seed: int = 0,
    out_path: str = "./data/gan_usps.npz",
):
    """Sample a labeled synthetic dataset and save as npz (the
    reference saves a TensorDataset .pt, gan.py:294-296)."""
    rng = jax.random.PRNGKey(seed)
    zk, lk = jax.random.split(rng)
    z = jax.random.normal(zk, (n_images, latent_dim))
    labels = jax.random.randint(lk, (n_images,), 0, n_classes)
    imgs = generator.apply(
        {"params": g_params, **g_state}, z, labels, train=False
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, x=np.asarray(imgs, np.float32),
             y=np.asarray(labels, np.int32))
    return out_path
