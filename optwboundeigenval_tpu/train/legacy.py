"""Legacy standalone training utilities.

Capability parity with the reference's pre-OptWBoundEignVal chest-x-ray
helpers (dcnn.py:418-579): plain ``train``/``validate``/``test`` epoch
loops, an ``AverageMeter``, and copy-on-best checkpointing.  Superseded
by :class:`train.trainer.SpectralTrainer` exactly as they were
superseded in the reference, but exported for users of that surface.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax
import numpy as np


class AverageMeter:
    """Running average tracker (dcnn.py AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def train_epoch(task, params, model_state, opt, opt_state, loader, rng):
    """One plain (unregularized) training epoch over a loader; returns
    (params, model_state, opt_state, avg_loss) — the reference
    ``train`` loop (dcnn.py:418-460) as pure-function steps."""
    import jax.numpy as jnp

    @jax.jit
    def step(params, model_state, opt_state, batch, rng):
        loss_fn = task.loss_fn(model_state, rng)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        new_params, new_opt_state = opt.step(
            grads, opt_state, params,
            grad_fn=lambda p: jax.value_and_grad(loss_fn)(p, batch), rng=rng,
        )
        if task.has_batch_stats:
            _, new_model_state = task.train_loss(
                new_params, model_state, batch, rng
            )
        else:
            new_model_state = model_state
        return new_params, new_model_state, new_opt_state, loss

    meter = AverageMeter()
    for data in loader:
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        rng, r = jax.random.split(rng)
        params, model_state, opt_state, loss = step(
            params, model_state, opt_state, batch, r
        )
        n = int(np.sum(np.asarray(data["w"]) > 0))
        meter.update(float(loss), n)
    return params, model_state, opt_state, meter.avg


def train2_epoch(model, params, model_state, opt, opt_state, loader, rng,
                 kl_weight: float = 0.0):
    """One VAE training epoch — the reference ``train2`` loop
    (dcnn.py:453-487): the model returns ``(output, mu, logvar)`` and
    the criterion is the W-BCE + KL VLoss (models/vae.vae_loss).
    Returns (params, model_state, opt_state, avg_loss)."""
    import jax.numpy as jnp

    from optwboundeigenval_tpu.models.vae import vae_loss

    has_batch_stats = bool(model_state)

    @jax.jit
    def step(params, model_state, opt_state, batch, rng):
        def loss_fn(p, b):
            variables = {"params": p, **model_state}
            kw = dict(mutable=["batch_stats"]) if has_batch_stats else {}
            out = model.apply(
                variables, b["x"], train=True, rngs={"reparam": rng}, **kw
            )
            outs = out[0] if has_batch_stats else out
            return vae_loss(outs, b["y"], b.get("w"), kl_weight=kl_weight)

        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        new_params, new_opt_state = opt.step(
            grads, opt_state, params,
            grad_fn=lambda p: jax.value_and_grad(loss_fn)(p, batch), rng=rng,
        )
        return new_params, new_opt_state, loss

    meter = AverageMeter()
    for data in loader:
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        rng, r = jax.random.split(rng)
        params, opt_state, loss = step(params, model_state, opt_state, batch, r)
        n = int(np.sum(np.asarray(data["w"]) > 0))
        meter.update(float(loss), n)
    return params, model_state, opt_state, meter.avg


def validate(task, params, model_state, loader):
    """Average eval loss + accuracy over a loader (dcnn.py validate)."""
    import jax.numpy as jnp

    @jax.jit
    def ev(params, model_state, batch):
        return task.eval_loss(params, model_state, batch)

    losses, accs = AverageMeter(), AverageMeter()
    for data in loader:
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        loss, out = ev(params, model_state, batch)
        w = np.asarray(data["w"])
        nreal = int(np.sum(w > 0))
        y = np.asarray(data["y"])[:nreal]
        o = np.asarray(out)[:nreal]
        if y.ndim == 1:
            acc = float(np.mean(np.argmax(o, axis=1) == y)) * 100
        else:
            acc = float(np.mean((o > 0) == (y > 0.5))) * 100
        losses.update(float(loss), nreal)
        accs.update(acc, nreal)
    return losses.avg, accs.avg


def test(task, params, model_state, loader) -> Tuple:
    """Standalone sigmoid test pass — the reference legacy ``test``
    (dcnn.py:548-579): collect sigmoid outputs over the loader, compute
    per-class ROC-AUC and its mean.  Returns
    ``(roc, avgroc, (labels, outputs))``."""
    import jax.numpy as jnp
    from sklearn.metrics import roc_auc_score

    @jax.jit
    def fwd(params, model_state, batch):
        out = task.predict(params, model_state, batch)
        return jax.nn.sigmoid(out)

    outputs, labels = [], []
    for data in loader:
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        out = np.asarray(fwd(params, model_state, batch))
        nreal = int(np.sum(np.asarray(data["w"]) > 0))
        outputs.append(out[:nreal])
        labels.append(np.asarray(data["y"])[:nreal])
    outputs = np.concatenate(outputs)
    labels = np.concatenate(labels)
    roc = roc_auc_score(labels, outputs, average=None)
    roc = np.atleast_1d(np.asarray(roc))
    return roc, float(roc.mean()), (labels, outputs)


def save_checkpoint_copy_on_best(
    payload: dict, is_best: bool, path: str = "./models/checkpoint.msgpack",
    best_path: Optional[str] = None,
):
    """Checkpoint + copy to *_best on improvement (dcnn.py
    save_checkpoint copy-on-best pattern)."""
    from optwboundeigenval_tpu.train import checkpoints

    checkpoints.save_checkpoint(path, payload)
    if is_best:
        best_path = best_path or path.replace(
            ".msgpack", "_best.msgpack"
        )
        shutil.copyfile(path, best_path)
        return best_path
    return path
