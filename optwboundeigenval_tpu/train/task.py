"""Task: binds a flax model and a loss into the pure functions the
trainer and curvature kernel consume.

The reference couples model/loss/data inside ``HVPOperator``
(opt.py:48-192) and ``OptWBoundEignVal`` (opt.py:544-578).  Here the
coupling is a small immutable object producing closures:

  * ``loss_fn(params, batch)``      — train-mode scalar loss (the
    function whose Hessian is regularized; reference computes HVPs in
    train mode, opt.py:421).  BatchNorm uses batch statistics but
    running averages are NOT updated inside curvature evaluations;
    dropout uses a fixed per-batch rng so every power-iteration step
    sees one network realization — matching the reference's reuse of a
    single autograd graph (opt.py:86-91).
  * ``loss_and_state(params, model_state, batch, rng)`` — training-step
    loss that also returns updated mutable state (BN running stats).
  * ``predict(params, model_state, batch)`` — eval-mode outputs
    (running BN statistics, no dropout) for f/accuracy evaluation
    (comp_f, opt.py:544-572).

Batches are dicts ``{"x", "y", "w"}``; ``w`` is a per-example weight
used to express the reference's batch-size-weighted averaging
(opt.py:739, opt.py:1035-1037) and to pad final partial batches to a
static shape (TPU-friendly; padded rows carry ``w = 0``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _weighted_mean(per_example: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    if w is None:
        return jnp.mean(per_example)
    w = w.astype(per_example.dtype)
    return jnp.sum(per_example * w) / jnp.maximum(jnp.sum(w), 1e-12)


def cross_entropy(outputs: jax.Array, y: jax.Array, w=None) -> jax.Array:
    """Softmax cross entropy from logits against integer labels
    (reference ``nn.CrossEntropyLoss``; see cnn_usps.py for the
    double-softmax deviation note)."""
    logp = jax.nn.log_softmax(outputs, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _weighted_mean(nll, w)


def cross_entropy_double_softmax(
    outputs: jax.Array, y: jax.Array, w=None
) -> jax.Array:
    """The reference's EXACT loss composition: its models apply softmax
    in-model (usps_data.py:335, forest_data.py:87) and then
    ``nn.CrossEntropyLoss`` applies log-softmax AGAIN.  Reproduced here
    from logits for head-to-head parity runs (benchmarks/parity) —
    regular configs use :func:`cross_entropy` (the documented
    single-softmax deviation, models/cnn_usps.py)."""
    probs = jax.nn.softmax(outputs, axis=-1)
    logp = jax.nn.log_softmax(probs, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _weighted_mean(nll, w)


def mse(outputs: jax.Array, y: jax.Array, w=None) -> jax.Array:
    per = jnp.mean((outputs - y) ** 2, axis=tuple(range(1, outputs.ndim)))
    return _weighted_mean(per, w)


def bce_with_logits(outputs: jax.Array, y: jax.Array, w=None) -> jax.Array:
    per = jnp.mean(
        jnp.maximum(outputs, 0) - outputs * y + jnp.log1p(jnp.exp(-jnp.abs(outputs))),
        axis=tuple(range(1, outputs.ndim)),
    )
    return _weighted_mean(per, w)


def kl_onehot(outputs: jax.Array, y: jax.Array, w=None) -> jax.Array:
    """KLDivLoss against scattered one-hot targets — the reference's
    KLDivLoss adapter (opt.py:182-187, opt.py:566-571).  With one-hot
    targets KL(target || input) reduces to picking -input at the label
    (the target-entropy term is 0); reference passes mean-reduced
    F.kl_div, whose denominator is the full element count."""
    num_classes = outputs.shape[-1]
    picked = -jnp.take_along_axis(outputs, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _weighted_mean(picked, w) / num_classes


def weighted_bce_with_logits(
    outputs: jax.Array, y: jax.Array, w=None
) -> jax.Array:
    """W_BCEWithLogitsLoss (dcnn.py:375-400): *global* positive/negative
    re-weighting — ``p`` = total positives and ``s`` = total valid
    labels over the whole batch across all classes, positives weighted
    ``s/p`` and negatives ``s/(s-p)`` (dcnn.py:390-398; if p is 0 or s,
    weights fall back to 2 for positives / 1 for negatives).  Per-class
    BCE means over non-NaN labels, then mean over classes that had any
    valid labels.  TenCrop target replication (dcnn.py:383-384) is
    handled by the caller reshaping crops into the batch dimension.

    Padded rows (``w == 0``) are excluded from the weights and means so
    static-shape padding stays exact."""
    valid = ~jnp.isnan(y)
    if w is not None:
        valid = valid & (w[:, None] > 0)
    y0 = jnp.where(valid, y, 0.0)
    p = jnp.sum(y0)
    s = jnp.sum(valid).astype(outputs.dtype)
    degenerate = (p == 0) | (p == s)
    w_pos = jnp.where(degenerate, 2.0, s / jnp.where(p == 0, 1.0, p))
    w_neg = jnp.where(degenerate, 1.0, s / jnp.where(s - p == 0, 1.0, s - p))
    weight = jnp.where(y0 > 0, w_pos, w_neg)
    log_sig = jax.nn.log_sigmoid(outputs)
    log_1m = jax.nn.log_sigmoid(-outputs)
    elt = -weight * (y0 * log_sig + (1.0 - y0) * log_1m)
    elt = jnp.where(valid, elt, 0.0)
    cnt = jnp.sum(valid, axis=0)
    per_class = jnp.sum(elt, axis=0) / jnp.maximum(cnt, 1)
    has_any = cnt > 0
    return jnp.sum(jnp.where(has_any, per_class, 0.0)) / jnp.maximum(
        jnp.sum(has_any), 1
    )


losses: Dict[str, Callable] = {
    "cross_entropy": cross_entropy,
    "cross_entropy_double_softmax": cross_entropy_double_softmax,
    "mse": mse,
    "bce_with_logits": bce_with_logits,
    "kl_onehot": kl_onehot,
    "weighted_bce_with_logits": weighted_bce_with_logits,
}


@dataclasses.dataclass(frozen=True)
class Task:
    """Immutable model+loss binding.  ``model`` is a flax Module whose
    ``__call__(x, train=...)`` returns outputs (logits)."""

    model: Any
    loss: Callable = cross_entropy
    has_batch_stats: bool = False
    has_dropout: bool = False
    example_shape: tuple = ()

    # ---- initialization ------------------------------------------------
    def init(self, rng, example_x):
        # jitted: eager init dispatches each op individually, which is
        # pathological over a tunneled TPU (tens of ms per op x ~1e3 ops
        # for a DenseNet121)
        init_fn = jax.jit(
            lambda r, x: self.model.init(
                {"params": r, "dropout": r}, x, train=False
            )
        )
        variables = init_fn(rng, example_x)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    # ---- forward passes ------------------------------------------------
    def _apply(self, params, model_state, x, train: bool, rng=None):
        variables = {"params": params, **model_state}
        rngs = {"dropout": rng} if (self.has_dropout and rng is not None) else None
        if train and self.has_batch_stats:
            out, _updates = self.model.apply(
                variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
            )
            return out
        return self.model.apply(variables, x, train=train, rngs=rngs)

    def loss_fn(self, model_state, rng=None) -> Callable:
        """Returns ``f(params, batch) -> scalar`` in train mode with
        frozen mutable state — the function differentiated (twice,
        thrice) by the curvature kernel."""

        def f(params, batch):
            out = self._apply(params, model_state, batch["x"], True, rng)
            return self.loss(out, batch["y"], batch.get("w"))

        return f

    def train_loss(self, params, model_state, batch, rng=None):
        """(loss, new_model_state) for the SGD step; BN running stats
        update here (and only here)."""
        variables = {"params": params, **model_state}
        rngs = {"dropout": rng} if (self.has_dropout and rng is not None) else None
        if self.has_batch_stats:
            out, updates = self.model.apply(
                variables, batch["x"], train=True, rngs=rngs, mutable=["batch_stats"]
            )
            new_state = {**model_state, **updates}
        else:
            out = self.model.apply(variables, batch["x"], train=True, rngs=rngs)
            new_state = model_state
        return self.loss(out, batch["y"], batch.get("w")), new_state

    def predict(self, params, model_state, batch):
        """Eval-mode outputs (comp_f / test_model path)."""
        return self._apply(params, model_state, batch["x"], False)

    def eval_loss(self, params, model_state, batch):
        out = self.predict(params, model_state, batch)
        return self.loss(out, batch["y"], batch.get("w")), out
