"""K-FAC: Kronecker-factored curvature machinery.

Capability parity with the reference K-FAC stack (kfac.py, SURVEY.md
§2.4) which serves two roles:
  1. the ``KFACOptimizer`` natural-gradient comparator optimizer
     (kfac.py:11-191), and
  2. the preconditioner of the inexact-LOBPCG eigensolver mode
     (opt.py:384-416, opt.py:426-430).

Reference mechanics -> TPU-native design:
  * torch forward-pre/backward hooks harvesting per-layer activations
    and grad-outputs (kfac.py:50-65) -> a single functional capture:
    flax ``intercept_methods`` records each Dense/Conv input and adds a
    zero "tap" to its output; one ``jax.vjp`` over the taps yields all
    grad-outputs in one backward pass.  No hooks, no globals — the
    whole thing jits.
  * covariance builders ``ComputeCovA``/``ComputeCovG``
    (kfac.py:277-367) including conv patch extraction
    (``_extract_patches``, kfac.py:201-218), bias augmentation, spatial
    and batch-averaged scalings -> :func:`cov_a` / :func:`cov_g` with
    identical scaling conventions (flatten order here is flax's
    ``(kh, kw, in_c)``, consistently used on both the factor and the
    matrix-form sides).
  * running stats ``m = decay * m + (1-decay) * cov`` initialized at
    identity (kfac.py:54-56, 221-225) -> :func:`update_factors`.
  * periodic eigendecomposition with eigenvalue clamping at 1e-10
    (``_update_inv``, kfac.py:81-93) -> :func:`compute_inverses`.
  * natural-gradient apply ``Q_g (Q_g^T M Q_a / (d_g d_a^T + damp))
    Q_a^T`` (``_get_natural_grad``, kfac.py:110-130) ->
    :func:`natural_grad_matrix` / :func:`apply_to_tree` (the latter is
    the LOBPCG residual preconditioner: reference walks modules and
    maps flat-vector slices, opt.py:384-416; here it walks the param
    pytree).

Fisher sampling (``comp_fisher``, opt.py:348-360): with
``sample_targets`` the grad-outputs come from a loss against targets
drawn from the model's own predictive distribution (categorical for CE,
bernoulli for BCE) — the "true Fisher" estimate.

Documented deviation: the reference's forward hooks update activation
stats on *every* grad-enabled forward anywhere in the program (an
emergent behavior of hook registration, kfac.py:50-51); here stats
update exactly at the refresh points the algorithm specifies.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# capture
# ---------------------------------------------------------------------------


class LayerCapture(NamedTuple):
    a: jax.Array  # layer input (activations)
    g: jax.Array  # dL/d(layer output)
    kind: str  # 'dense' | 'conv'
    conv_cfg: Optional[tuple]  # (kernel_size, strides, padding) for conv
    w: Optional[jax.Array] = None  # per-example padding weights


def _path_of(module: nn.Module) -> str:
    return "/".join(str(p) for p in module.path)


def capture(
    task,
    params,
    model_state,
    batch,
    rng=None,
    *,
    sample_targets: bool = False,
    sample_rng=None,
):
    """Run one forward+backward, returning ``{path: LayerCapture}`` for
    every Dense/Conv layer plus the loss value.  Pure function of its
    inputs; jit-compatible."""
    targets = batch["y"]
    if sample_targets:
        outputs = task.predict(params, model_state, batch)
        assert sample_rng is not None
        if outputs.ndim > 1 and task.loss.__name__ in (
            "bce_with_logits",
            "weighted_bce_with_logits",
        ):
            targets = jax.random.bernoulli(
                sample_rng, jax.nn.sigmoid(outputs)
            ).astype(jnp.float32)
        else:
            targets = jax.random.categorical(sample_rng, outputs, axis=-1)

    meta: Dict[str, tuple] = {}

    def run(taps):
        acts: Dict[str, jax.Array] = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (
                isinstance(mod, (nn.Dense, nn.Conv))
                and context.method_name == "__call__"
            ):
                path = _path_of(mod)
                acts[path] = args[0]
                if isinstance(mod, nn.Conv):
                    strides = mod.strides or 1
                    if isinstance(strides, int):
                        strides = (strides, strides)
                    ksize = mod.kernel_size
                    if isinstance(ksize, int):
                        ksize = (ksize, ksize)
                    meta[path] = (
                        "conv",
                        (tuple(ksize), tuple(strides), mod.padding),
                    )
                else:
                    meta[path] = ("dense", None)
                out = next_fun(*args, **kwargs)
                if taps is not None and path in taps:
                    out = out + taps[path]
                return out
            return next_fun(*args, **kwargs)

        variables = {"params": params, **model_state}
        rngs = {"dropout": rng} if (task.has_dropout and rng is not None) else None
        with nn.intercept_methods(interceptor):
            if task.has_batch_stats:
                out, _ = task.model.apply(
                    variables, batch["x"], train=True, rngs=rngs,
                    mutable=["batch_stats"],
                )
            else:
                out = task.model.apply(variables, batch["x"], train=True, rngs=rngs)
        loss = task.loss(out, targets, batch.get("w"))
        return loss, acts

    # discover tap shapes (each layer's OUTPUT) with one abstract pass
    def out_shapes(_):
        outs = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (
                isinstance(mod, (nn.Dense, nn.Conv))
                and context.method_name == "__call__"
            ):
                o = next_fun(*args, **kwargs)
                outs[_path_of(mod)] = jnp.zeros_like(o)
                return o
            return next_fun(*args, **kwargs)

        variables = {"params": params, **model_state}
        rngs = {"dropout": rng} if (task.has_dropout and rng is not None) else None
        with nn.intercept_methods(interceptor):
            if task.has_batch_stats:
                task.model.apply(
                    variables, batch["x"], train=True, rngs=rngs,
                    mutable=["batch_stats"],
                )
            else:
                task.model.apply(variables, batch["x"], train=True, rngs=rngs)
        return outs

    taps0 = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(out_shapes, 0.0)
    )

    (loss, acts), vjp_fn = jax.vjp(lambda t: run(t), taps0, has_aux=False)
    # run returns (loss, acts); cotangent: 1.0 for loss, zeros for acts
    g_taps = vjp_fn((jnp.ones_like(loss), jax.tree.map(jnp.zeros_like, acts)))[0]

    out: Dict[str, LayerCapture] = {}
    for path, a in acts.items():
        kind, cfg = meta[path]
        out[path] = LayerCapture(
            a=a, g=g_taps[path], kind=kind, conv_cfg=cfg, w=batch.get("w")
        )
    return loss, out


# ---------------------------------------------------------------------------
# covariances (ComputeCovA / ComputeCovG parity)
# ---------------------------------------------------------------------------


def extract_patches(x, kernel_size, strides, padding):
    """im2col with flatten order ``(kh, kw, in_c)`` — consistent with
    flax conv kernels of shape (kh, kw, in_c, out_c).  Reference:
    ``_extract_patches`` (kfac.py:201-218, torch order (in_c, kh, kw));
    order differs but is used consistently on both sides here."""
    kh, kw = kernel_size
    sh, sw = strides
    if padding == "SAME":
        H, W = x.shape[1], x.shape[2]
        out_h = -(-H // sh)
        out_w = -(-W // sw)
        pad_h = max((out_h - 1) * sh + kh - H, 0)
        pad_w = max((out_w - 1) * sw + kw - W, 0)
        pads = (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        )
    elif padding == "VALID":
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    else:  # explicit [(lo, hi), (lo, hi)]
        p = padding
        pads = ((0, 0), tuple(p[0]), tuple(p[1]), (0, 0))
    x = jnp.pad(x, pads)
    H, W = x.shape[1], x.shape[2]
    out_h = (H - kh) // sh + 1
    out_w = (W - kw) // sw + 1
    cols = []
    for i in range(kh):
        for j in range(kw):
            cols.append(
                x[:, i : i + out_h * sh : sh, j : j + out_w * sw : sw, :]
            )
    # (B, out_h, out_w, kh*kw, C) -> (B, out_h, out_w, kh*kw*C)
    patches = jnp.stack(cols, axis=3)
    return patches.reshape(x.shape[0], out_h, out_w, kh * kw * x.shape[3])


def _padding_stats(w, batch: int, dtype):
    """``(mask, n, sum_w)``: per-example real-row mask, real example
    count, and total weight.  Without weights all rows are real —
    reference semantics (kfac.py assumes unpadded batches).

    Factors must stay exact on padded batches (repo convention): padded
    rows carry nonzero activations through bias propagation, so cov_a
    would be polluted and the 1/B scale wrong by B/sum(w) on every
    final partial batch feeding the preconditioner.
    """
    if w is None:
        b = jnp.asarray(batch, dtype)
        return None, b, b
    mask = (w > 0).astype(dtype)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return mask, n, jnp.maximum(jnp.sum(w.astype(dtype)), 1e-12)


def cov_a(cap: LayerCapture, has_bias: bool) -> jax.Array:
    """Activation covariance (ComputeCovA, kfac.py:296-314), with padded
    zero-weight rows masked out and the REAL example count as the
    normalizer (exactness on partial batches)."""
    a = cap.a
    mask, n, _ = _padding_stats(cap.w, a.shape[0], a.dtype)
    if cap.kind == "conv":
        ksize, strides, padding = cap.conv_cfg
        a = extract_patches(a, ksize, strides, padding)
        spatial = a.shape[1] * a.shape[2]
        a = a.reshape(-1, a.shape[-1])
        if has_bias:
            a = jnp.concatenate([a, jnp.ones((a.shape[0], 1), a.dtype)], axis=1)
        if mask is not None:
            # rows are example-major after reshape: repeat the mask
            # spatial times (zeroes the bias column of padded rows too)
            a = a * jnp.repeat(mask, spatial)[:, None]
        a = a / spatial
        return a.T @ (a / n)
    batch = a.shape[0]
    a = a.reshape(batch, -1)
    if has_bias:
        a = jnp.concatenate([a, jnp.ones((batch, 1), a.dtype)], axis=1)
    if mask is not None:
        a = a * mask[:, None]
    return a.T @ (a / n)


def cov_g(cap: LayerCapture, batch_averaged: bool = True) -> jax.Array:
    """Grad-output covariance (ComputeCovG, kfac.py:341-367).

    ``batch_averaged`` undoes the loss's mean normalization before the
    outer product.  Here losses are weighted means (divide by
    ``sum(w)``), so the rescale is ``sum(w)`` — not the padded leading
    dimension — and the final normalizer is the real example count.
    """
    g = cap.g
    mask, n, sum_w = _padding_stats(cap.w, g.shape[0], g.dtype)
    if cap.kind == "conv":
        spatial = g.shape[1] * g.shape[2]
        g = g.reshape(-1, g.shape[-1])
        if mask is not None:
            g = g * jnp.repeat(mask, spatial)[:, None]
        if batch_averaged:
            g = g * sum_w
        g = g * spatial
        return g.T @ (g / (n * spatial))
    batch = g.shape[0]
    g = g.reshape(batch, -1)
    if mask is not None:
        g = g * mask[:, None]
    if batch_averaged:
        g = g * sum_w
    return g.T @ (g / n)


# ---------------------------------------------------------------------------
# factor state
# ---------------------------------------------------------------------------


class LayerFactors(NamedTuple):
    m_aa: jax.Array
    m_gg: jax.Array
    Q_a: jax.Array
    d_a: jax.Array
    Q_g: jax.Array
    d_g: jax.Array


KFACFactors = Dict[str, LayerFactors]


def _has_bias(params, path: str) -> bool:
    node = params
    for part in path.split("/"):
        node = node[part]
    return "bias" in node


def init_factors(task, params, model_state, example_batch, rng=None) -> KFACFactors:
    """Identity-initialized running factors (kfac.py:54-56, 63-64)."""
    _, caps = capture(task, params, model_state, example_batch, rng)
    out = {}
    for path, cap in caps.items():
        aa = cov_a(cap, _has_bias(params, path))
        gg = cov_g(cap)
        na, ng = aa.shape[0], gg.shape[0]
        out[path] = LayerFactors(
            m_aa=jnp.eye(na, dtype=aa.dtype),
            m_gg=jnp.eye(ng, dtype=gg.dtype),
            Q_a=jnp.eye(na, dtype=aa.dtype),
            d_a=jnp.ones(na, aa.dtype),
            Q_g=jnp.eye(ng, dtype=gg.dtype),
            d_g=jnp.ones(ng, gg.dtype),
        )
    return out


def update_factors(
    factors: KFACFactors,
    caps: Dict[str, LayerCapture],
    params,
    stat_decay: float = 0.95,
    batch_averaged: bool = True,
) -> KFACFactors:
    """EMA update ``m = decay * m + (1 - decay) * cov``
    (update_running_stat, kfac.py:221-225)."""
    out = dict(factors)
    for path, cap in caps.items():
        f = factors[path]
        aa = cov_a(cap, _has_bias(params, path))
        gg = cov_g(cap, batch_averaged)
        out[path] = f._replace(
            m_aa=stat_decay * f.m_aa + (1 - stat_decay) * aa,
            m_gg=stat_decay * f.m_gg + (1 - stat_decay) * gg,
        )
    return out


def compute_inverses(factors: KFACFactors, eps: float = 1e-10) -> KFACFactors:
    """Eigendecompose factors, clamping eigenvalues below ``eps`` to 0
    (_update_inv, kfac.py:81-93)."""
    out = {}
    for path, f in factors.items():
        d_a, Q_a = jnp.linalg.eigh(f.m_aa)
        d_g, Q_g = jnp.linalg.eigh(f.m_gg)
        d_a = d_a * (d_a > eps)
        d_g = d_g * (d_g > eps)
        out[path] = f._replace(Q_a=Q_a, d_a=d_a, Q_g=Q_g, d_g=d_g)
    return out


# ---------------------------------------------------------------------------
# natural-gradient apply
# ---------------------------------------------------------------------------


def _to_matrix(kernel_grad, bias_grad):
    """Matrix form [out_dim, in_dim(+1)] (kfac.py:96-108).  Flax dense
    kernel is (in, out); conv kernel (kh, kw, in_c, out)."""
    if kernel_grad.ndim == 4:
        kh, kw, ic, oc = kernel_grad.shape
        m = kernel_grad.reshape(kh * kw * ic, oc).T
    else:
        m = kernel_grad.T
    if bias_grad is not None:
        m = jnp.concatenate([m, bias_grad.reshape(-1, 1)], axis=1)
    return m


def _from_matrix(m, kernel_like, has_bias):
    if has_bias:
        km, bm = m[:, :-1], m[:, -1]
    else:
        km, bm = m, None
    if kernel_like.ndim == 4:
        kh, kw, ic, oc = kernel_like.shape
        k = km.T.reshape(kh, kw, ic, oc)
    else:
        k = km.T
    return k, bm


def natural_grad_matrix(f: LayerFactors, m: jax.Array, damping: float) -> jax.Array:
    """``Q_g (Q_g^T m Q_a / (d_g d_a^T + damping)) Q_a^T``
    (_get_natural_grad, kfac.py:110-130)."""
    v1 = f.Q_g.T @ m @ f.Q_a
    v2 = v1 / (f.d_g[:, None] * f.d_a[None, :] + damping)
    return f.Q_g @ v2 @ f.Q_a.T


def apply_to_tree(factors: KFACFactors, tree, damping: float = 0.0):
    """Apply the factored inverse to a gradient/residual pytree: the
    LOBPCG preconditioner (reference ``kfac`` method walking modules and
    flat-vector slices, opt.py:384-416) and the natural-grad transform
    of the K-FAC optimizer.  Layers without factors pass through
    unchanged (opt.py:399 ``if m in self.kfac_opt.modules``)."""

    def walk(node, path):
        if isinstance(node, dict) and "kernel" in node:
            key = "/".join(path)
            if key in factors:
                has_bias = "bias" in node
                m = _to_matrix(node["kernel"], node.get("bias"))
                nat = natural_grad_matrix(factors[key], m, damping)
                k, b = _from_matrix(nat, node["kernel"], has_bias)
                out = dict(node)
                out["kernel"] = k
                if has_bias:
                    out["bias"] = b
                return out
            return node
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    from flax.core import FrozenDict

    plain = tree
    was_frozen = isinstance(tree, FrozenDict)
    if was_frozen:
        plain = tree.unfreeze()
    out = walk(plain, ())
    return FrozenDict(out) if was_frozen else out


# ---------------------------------------------------------------------------
# trainer-facing helpers
# ---------------------------------------------------------------------------


def fit_factors(task, params, model_state, batch, rng, *,
                prev: Optional[KFACFactors] = None,
                stat_decay: float = 0.95,
                sample_targets: bool = True) -> KFACFactors:
    """LOBPCG refresh (init_kfac, opt.py:362-382): capture stats on this
    batch (with sampled "true-Fisher" targets if ``sample_targets`` —
    the ``kfac_rand`` flag), EMA-update the running factors, and
    recompute inverses."""
    rng_cap, rng_sample = jax.random.split(rng)
    _, caps = capture(
        task, params, model_state, batch, rng_cap,
        sample_targets=sample_targets, sample_rng=rng_sample,
    )
    if prev is None:
        factors = init_factors(task, params, model_state, batch, rng_cap)
    else:
        factors = prev
    factors = update_factors(factors, caps, params, stat_decay)
    return compute_inverses(factors)


def precond_apply(factors: KFACFactors, residual, damping: float = 0.0):
    """The ``precond`` hook handed to the eigensolver
    (ops/eigen.py): r -> F^{-1} r per factored layer."""
    return apply_to_tree(factors, residual, damping)
