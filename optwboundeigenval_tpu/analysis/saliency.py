"""Input-gradient saliency maps.

Reference ``saliency`` (opt.py:1259-1312): per-image gradient of the
predicted-class score w.r.t. the input, plotted alongside the image.
TPU-native: the whole batch's saliency is one vmapped/jitted
``jax.grad`` over inputs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def batch_saliency(task, params, model_state, x, target_class=None):
    """|d score / d x| per example.  ``target_class`` defaults to the
    predicted class (argmax), matching the reference's use of the
    model's own prediction."""

    def score(xi, cls):
        out = task.predict(params, model_state, {"x": xi[None]})[0]
        return out[cls]

    preds = jnp.argmax(
        task.predict(params, model_state, {"x": x}), axis=-1
    )
    cls = preds if target_class is None else jnp.full_like(preds, target_class)
    grads = jax.vmap(jax.grad(score), in_axes=(0, 0))(x, cls)
    return jnp.abs(grads)


def saliency_maps(trainer, loader, max_img: int = 10, plot_dir: str = "./plots"):
    """Save saliency/image pairs for up to ``max_img`` test images
    (opt.py:1259-1312 writes per-image PNGs under ./plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(plot_dir, exist_ok=True)
    fn = jax.jit(
        lambda p, ms, x: batch_saliency(trainer.task, p, ms, x)
    )
    count = 0
    for data in loader:
        x = jnp.asarray(data["x"])
        sal = np.asarray(fn(trainer.params, trainer.model_state, x))
        imgs = np.asarray(data["x"])
        w = np.asarray(data["w"])
        for i in range(len(imgs)):
            if w[i] == 0 or count >= max_img:
                break
            fig, axes = plt.subplots(1, 2, figsize=(6, 3))
            img = imgs[i].squeeze()
            s = sal[i].squeeze()
            if img.ndim == 1:
                side = int(np.sqrt(img.size))
                img = img.reshape(side, side)
                s = s.reshape(side, side)
            axes[0].imshow(img, cmap="gray")
            axes[0].set_title("image")
            axes[1].imshow(s, cmap="hot")
            axes[1].set_title("saliency")
            for ax in axes:
                ax.axis("off")
            fig.savefig(
                os.path.join(
                    plot_dir, f"{trainer.header2}_saliency_{count}.png"
                )
            )
            plt.close(fig)
            count += 1
        if count >= max_img:
            break
