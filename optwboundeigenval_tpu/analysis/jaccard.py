"""Jaccard saliency comparison — model-vs-baseline interpretability
audit.

Capability parity with reference ``jaccard`` (opt.py:1364-1714) and
``jaccard_comp`` (opt.py:1716-1855):

  * per-class decision cutoffs chosen to maximize F1 on the
    precision-recall curve (opt.py:1456-1471);
  * saliency maps per image (input gradients, guided backprop, or
    Grad-CAM on a feature layer — opt.py:1384-1386) thresholded either
    at a fixed value or a per-image quantile (opt.py:1571-1578);
  * Jaccard overlap between the model's and the baseline's binary
    saliency masks per image;
  * 2x2 mean-Jaccard matrices conditioned on (model correct/incorrect
    x baseline correct/incorrect) per class, plus confusion-matrix
    CSVs (opt.py:1610-1660);
  * low-Jaccard image triptychs (image / model map / baseline map) and
    Jaccard histograms;
  * optional logistic-regression-on-saliency meta-classifier trained
    online (opt.py:1403-1450);
  * ``jaccard_comp``: pairwise across a list of models with
    same-prediction conditioning (opt.py:1716-1855).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def f1_max_cutoffs(labels: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Per-class threshold maximizing F1 on the PR curve
    (opt.py:1456-1471), with NaN-label masking."""
    from sklearn.metrics import precision_recall_curve

    ncls = scores.shape[1]
    cutoffs = np.full(ncls, 0.5)
    for i in range(ncls):
        li, si = labels[:, i], scores[:, i]
        good = li == li
        li, si = li[good], si[good]
        if len(np.unique(li)) < 2:
            continue
        prec, rec, thr = precision_recall_curve(li, si)
        f1 = 2 * prec * rec / np.maximum(prec + rec, 1e-12)
        best = int(np.nanargmax(f1[:-1])) if len(thr) else 0
        cutoffs[i] = thr[min(best, len(thr) - 1)]
    return cutoffs


def saliency_map(task, params, model_state, x, target_class=None,
                 method: str = "saliency", layer_path: Optional[str] = None):
    """One of the reference's map generators: plain input gradients,
    guided backprop, or Grad-CAM."""
    if method == "gradcam":
        from optwboundeigenval_tpu.analysis.grad_cam import grad_cam

        assert layer_path is not None
        return grad_cam(task, params, model_state, jnp.asarray(x), layer_path,
                        target_class)
    if method == "guided":
        from optwboundeigenval_tpu.analysis.guided_backprop import (
            generate_gradients,
        )

        g = generate_gradients(task, params, model_state, jnp.asarray(x),
                               target_class)
    else:
        from optwboundeigenval_tpu.analysis.saliency import batch_saliency

        g = batch_saliency(task, params, model_state, jnp.asarray(x),
                           target_class)
    g = np.abs(np.asarray(g))
    if g.ndim == 4:  # collapse channels
        g = g.max(axis=-1)
    return g


def threshold_mask(maps: np.ndarray, cutoff: Optional[float] = None,
                   quantile: Optional[float] = 0.9) -> np.ndarray:
    """Fixed or per-image-quantile thresholding (opt.py:1571-1578)."""
    if cutoff is not None:
        return maps > cutoff
    q = np.quantile(maps.reshape(maps.shape[0], -1), quantile, axis=1)
    return maps > q[:, None, None]


def jaccard_of_masks(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    inter = np.sum(a & b, axis=(1, 2))
    union = np.sum(a | b, axis=(1, 2))
    return inter / np.maximum(union, 1)


# ---------------------------------------------------------------------------
# main audits
# ---------------------------------------------------------------------------


def jaccard_audit(
    trainer,
    baseline,
    loader,
    *,
    method: str = "saliency",
    layer_path: Optional[str] = None,
    quantile: float = 0.9,
    cutoff: Optional[float] = None,
    max_img: int = 25,
    train_meta: bool = False,
    log_dir: str = "./logs",
    plot_dir: str = "./plots",
    tag: str = "jaccard",
):
    """Compare ``trainer``'s saliency against ``baseline``'s over a
    loader.  Returns a dict with per-image jaccards, the 2x2
    correctness-conditioned mean matrix, and per-class cutoffs; writes
    CSVs, a histogram, and low-Jaccard triptychs.

    ``train_meta`` additionally fits the logistic-regression
    meta-classifier on the model's saliency maps (opt.py:1403-1450)."""
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(plot_dir, exist_ok=True)

    all_scores_m, all_scores_b, all_labels = [], [], []
    all_jac, worst = [], []
    meta_x, meta_y = [], []

    for data in loader:
        w = np.asarray(data["w"])
        nreal = int(np.sum(w > 0))
        x = np.asarray(data["x"])[:nreal]
        y = np.asarray(data["y"])[:nreal]

        out_m = np.asarray(
            trainer.task.predict(trainer.params, trainer.model_state,
                                 {"x": jnp.asarray(x)})
        )
        out_b = np.asarray(
            baseline.task.predict(baseline.params, baseline.model_state,
                                  {"x": jnp.asarray(x)})
        )
        all_scores_m.append(out_m)
        all_scores_b.append(out_b)
        all_labels.append(y)

        sm = saliency_map(trainer.task, trainer.params, trainer.model_state,
                          x, method=method, layer_path=layer_path)
        sb = saliency_map(baseline.task, baseline.params,
                          baseline.model_state, x, method=method,
                          layer_path=layer_path)
        mm = threshold_mask(sm, cutoff, quantile)
        mb = threshold_mask(sb, cutoff, quantile)
        jac = jaccard_of_masks(mm, mb)
        all_jac.append(jac)
        for i in range(len(x)):
            worst.append((float(jac[i]), x[i], sm[i], sb[i]))
        if train_meta:
            meta_x.append(sm.reshape(len(sm), -1))
            meta_y.append(y)

    scores_m = np.concatenate(all_scores_m)
    scores_b = np.concatenate(all_scores_b)
    labels = np.concatenate(all_labels)
    jac = np.concatenate(all_jac)

    multilabel = labels.ndim > 1
    if multilabel:
        cutoffs_m = f1_max_cutoffs(labels, 1 / (1 + np.exp(-scores_m)))
        cutoffs_b = f1_max_cutoffs(labels, 1 / (1 + np.exp(-scores_b)))
        correct_m = np.all(
            ((1 / (1 + np.exp(-scores_m)) > cutoffs_m) == (labels > 0.5))
            | np.isnan(labels),
            axis=1,
        )
        correct_b = np.all(
            ((1 / (1 + np.exp(-scores_b)) > cutoffs_b) == (labels > 0.5))
            | np.isnan(labels),
            axis=1,
        )
    else:
        cutoffs_m = cutoffs_b = None
        correct_m = np.argmax(scores_m, axis=1) == labels
        correct_b = np.argmax(scores_b, axis=1) == labels

    # 2x2 conditioned mean-jaccard matrix (opt.py:1610-1660)
    cond = np.full((2, 2), np.nan)
    counts = np.zeros((2, 2), int)
    for mi in (0, 1):
        for bi in (0, 1):
            sel = (correct_m == bool(mi)) & (correct_b == bool(bi))
            counts[1 - mi, 1 - bi] = int(np.sum(sel))
            if np.any(sel):
                cond[1 - mi, 1 - bi] = float(np.mean(jac[sel]))

    np.savetxt(os.path.join(log_dir, f"{trainer.header2}_{tag}_cond.csv"),
               cond, delimiter=",")
    np.savetxt(os.path.join(log_dir, f"{trainer.header2}_{tag}_counts.csv"),
               counts, delimiter=",", fmt="%d")
    np.savetxt(os.path.join(log_dir, f"{trainer.header2}_{tag}_values.csv"),
               jac, delimiter=",")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.hist(jac, bins=20)
    ax.set_xlabel("jaccard")
    fig.savefig(os.path.join(plot_dir, f"{trainer.header2}_{tag}_hist.png"))
    plt.close(fig)

    # low-jaccard triptychs (opt.py:1610-1660)
    worst.sort(key=lambda t: t[0])
    for k, (jv, img, sm, sb) in enumerate(worst[:max_img]):
        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
        im = img.squeeze()
        if im.ndim == 3 and im.shape[-1] == 3:
            im = (im - im.min()) / (im.max() - im.min() + 1e-8)
            axes[0].imshow(im)
        else:
            axes[0].imshow(im if im.ndim == 2 else im[..., 0], cmap="gray")
        axes[1].imshow(sm, cmap="hot")
        axes[2].imshow(sb, cmap="hot")
        for ax_, title in zip(axes, ("image", "model", "baseline")):
            ax_.set_title(title)
            ax_.axis("off")
        fig.suptitle(f"jaccard={jv:.3f}")
        fig.savefig(
            os.path.join(plot_dir, f"{trainer.header2}_{tag}_worst{k}.png")
        )
        plt.close(fig)

    meta = None
    if train_meta and meta_x:
        meta = fit_meta_classifier(np.concatenate(meta_x),
                                   np.concatenate(meta_y))

    return {
        "jaccard": jac,
        "conditioned": cond,
        "counts": counts,
        "cutoffs_model": cutoffs_m,
        "cutoffs_baseline": cutoffs_b,
        "meta": meta,
    }


def fit_meta_classifier(saliency_flat: np.ndarray, labels: np.ndarray,
                        steps: int = 200, lr: float = 0.1):
    """Logistic regression on flattened saliency maps
    (opt.py:1403-1450; model dcnn.py:332-341) trained with jitted
    full-batch gradient descent."""
    y = labels if labels.ndim > 1 else (labels[:, None] > 0).astype(np.float32)
    y = np.nan_to_num(y, nan=0.0).astype(np.float32)
    x = jnp.asarray(saliency_flat, jnp.float32)
    yj = jnp.asarray(y)
    wshape = (x.shape[1], y.shape[1])
    params = {"w": jnp.zeros(wshape), "b": jnp.zeros(y.shape[1])}

    @jax.jit
    def step(params):
        def loss(p):
            logits = x @ p["w"] + p["b"]
            return jnp.mean(
                jnp.maximum(logits, 0) - logits * yj
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )

        g = jax.grad(loss)(params)
        return jax.tree.map(lambda p_, g_: p_ - lr * g_, params, g)

    for _ in range(steps):
        params = step(params)
    return jax.tree.map(np.asarray, params)


def jaccard_comp(
    trainers: Sequence,
    loader,
    *,
    method: str = "saliency",
    layer_path: Optional[str] = None,
    quantile: float = 0.9,
    same_pred_only: bool = True,
    log_dir: str = "./logs",
):
    """Pairwise saliency-overlap comparison across models, optionally
    restricted to examples where both models predict the same class
    (opt.py:1716-1855).  Returns an (n, n) matrix of mean jaccards."""
    os.makedirs(log_dir, exist_ok=True)
    n = len(trainers)
    sums = np.zeros((n, n))
    cnts = np.zeros((n, n))
    for data in loader:
        w = np.asarray(data["w"])
        nreal = int(np.sum(w > 0))
        x = np.asarray(data["x"])[:nreal]
        preds, masks = [], []
        for tr in trainers:
            out = np.asarray(
                tr.task.predict(tr.params, tr.model_state,
                                {"x": jnp.asarray(x)})
            )
            preds.append(np.argmax(out, axis=1))
            sm = saliency_map(tr.task, tr.params, tr.model_state, x,
                              method=method, layer_path=layer_path)
            masks.append(threshold_mask(sm, None, quantile))
        for a in range(n):
            for b in range(a + 1, n):
                jac = jaccard_of_masks(masks[a], masks[b])
                sel = (preds[a] == preds[b]) if same_pred_only else np.ones(
                    len(jac), bool
                )
                sums[a, b] += float(np.sum(jac[sel]))
                cnts[a, b] += int(np.sum(sel))
    mat = np.full((n, n), np.nan)
    for a in range(n):
        mat[a, a] = 1.0
        for b in range(a + 1, n):
            if cnts[a, b] > 0:
                mat[a, b] = mat[b, a] = sums[a, b] / cnts[a, b]
    np.savetxt(os.path.join(log_dir, "jaccard_comp.csv"), mat, delimiter=",")
    return mat
