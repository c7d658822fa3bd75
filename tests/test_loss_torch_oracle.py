"""Loss-function parity against the reference's actual torch ops.

The reference's losses are torch modules (nn.CrossEntropyLoss,
KLDivLoss one-hot adapter opt.py:182-187, W_BCEWithLogitsLoss
dcnn.py:375-400).  torch (CPU) is available in the build image, so
these tests check our jnp implementations against the real torch
semantics — stronger than transcription tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from optwboundeigenval_tpu.train.task import (
    bce_with_logits,
    cross_entropy,
    kl_onehot,
    weighted_bce_with_logits,
)


@pytest.fixture
def logits_labels():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=16).astype(np.int64)
    return logits, labels


def test_cross_entropy_matches_torch(logits_labels):
    logits, labels = logits_labels
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(
        torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_kl_onehot_matches_torch_kldivloss(logits_labels):
    """The reference scatters targets to one-hot and applies KLDivLoss
    with mean reduction (opt.py:182-187) — inputs are NOT logs in its
    usage, so KL reduces to mean(-onehot * input) elementwise."""
    logits, labels = logits_labels
    ours = float(kl_onehot(jnp.asarray(logits), jnp.asarray(labels)))
    onehot = torch.zeros(16, 7)
    onehot.scatter_(1, torch.from_numpy(labels).view(-1, 1), 1)
    ref = float(
        torch.nn.KLDivLoss(reduction="mean")(
            torch.from_numpy(logits), onehot
        )
    )
    # torch KL = mean(target * (log(target) - input)); with one-hot
    # targets log(1)=0 so ref = mean(-onehot * input) = ours
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(12, 5)).astype(np.float32)
    y = (rng.random((12, 5)) < 0.4).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    ref = float(
        torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x),
                                     torch.from_numpy(y))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_weighted_bce_matches_reference_torch_module():
    """Execute the reference W_BCEWithLogitsLoss math with real torch
    ops (global s/p weights, NaN masking, per-class mean of means)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    y = (rng.random((10, 4)) < 0.35).astype(np.float32)
    y[rng.random((10, 4)) < 0.2] = np.nan

    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    classes = xt.size()[1]
    f = torch.zeros(classes)
    t2 = yt[yt == yt]
    p = int(t2.sum().numpy())
    s = int(np.prod(t2.size()))
    for i in range(classes):
        xi, ti = xt[:, i], yt[:, i]
        good = ti == ti
        xi, ti = xi[good], ti[good]
        if p != 0 and p != s:
            w = ti * (s / p - s / (s - p)) + s / (s - p)
        else:
            w = ti + 1
        f[i] = torch.nn.functional.binary_cross_entropy_with_logits(
            xi, ti, w
        )
    ref = float(f[f == f].mean())

    ours = float(
        weighted_bce_with_logits(jnp.asarray(x), jnp.asarray(y))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
