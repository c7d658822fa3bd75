"""Grad-CAM and heatmap overlay.

Capability parity with the reference's optional
``pytorch_grad_cam.GradCAM`` on the last feature layer
(opt.py:1384-1386) and the overlay helper ``show_cam_on_image``
(cam_on_image.py:8-32).

TPU-native: the target layer's activation map and its gradient come
from one vjp over an additive tap injected with a flax interceptor —
the same mechanism as the K-FAC capture (ops/kfac.py), no hooks."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def layer_output_and_grad(task, params, model_state, x, layer_path: str,
                          target_class=None):
    """Returns (activations A, dScore/dA) for the module whose flax path
    joins to ``layer_path`` (e.g. the last conv/module of the trunk)."""

    acts: dict = {}

    def forward(tap):
        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            path = "/".join(str(p) for p in context.module.path)
            if path == layer_path and context.method_name == "__call__":
                acts["a"] = out
                out = out + tap
            return out

        variables = {"params": params, **model_state}
        with nn.intercept_methods(interceptor):
            out = task.model.apply(variables, x, train=False)
        preds = jnp.argmax(out, axis=-1) if target_class is None else (
            jnp.full((x.shape[0],), target_class, jnp.int32)
        )
        score = jnp.sum(
            jnp.take_along_axis(out, preds[:, None], axis=1)
        )
        return score

    # discover tap shape
    probe_shape = {}

    def discover(_):
        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            path = "/".join(str(p) for p in context.module.path)
            if path == layer_path and context.method_name == "__call__":
                probe_shape["s"] = jax.eval_shape(lambda o: o, out)
            return out

        variables = {"params": params, **model_state}
        with nn.intercept_methods(interceptor):
            task.model.apply(variables, x, train=False)
        return 0.0

    jax.eval_shape(discover, 0.0)
    if "s" not in probe_shape:
        raise KeyError(f"layer path {layer_path!r} not found in model")
    tap0 = jnp.zeros(probe_shape["s"].shape, probe_shape["s"].dtype)
    score, vjp_fn = jax.vjp(forward, tap0)
    grad_a = vjp_fn(jnp.ones_like(score))[0]
    return acts["a"], grad_a


def grad_cam(task, params, model_state, x, layer_path: str,
             target_class=None) -> np.ndarray:
    """Class activation map: ReLU(sum_k w_k A_k) with channel weights
    w_k = spatial mean of dScore/dA_k, normalized to [0, 1] and resized
    to the input resolution."""
    a, g = layer_output_and_grad(task, params, model_state, x, layer_path,
                                 target_class)
    weights = jnp.mean(g, axis=(1, 2), keepdims=True)  # (B,1,1,C)
    cam = jnp.maximum(jnp.sum(weights * a, axis=-1), 0.0)  # (B, h, w)
    cam = cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-8)
    cam_np = np.asarray(cam)
    # bilinear resize to input H, W
    from scipy import ndimage

    H, W = x.shape[1], x.shape[2]
    out = np.stack(
        [
            ndimage.zoom(c, (H / c.shape[0], W / c.shape[1]), order=1)
            for c in cam_np
        ]
    )
    return out


def show_cam_on_image(img: np.ndarray, mask: np.ndarray,
                      use_rgb: bool = True, alpha: float = 0.5) -> np.ndarray:
    """Overlay a [0,1] heatmap on a [0,1] image (cam_on_image.py:8-32,
    which wraps cv2.applyColorMap; here matplotlib's jet)."""
    import matplotlib.cm as cm

    heatmap = cm.jet(mask)[..., :3]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    overlay = alpha * heatmap + (1 - alpha) * img
    return np.clip(overlay, 0, 1)
