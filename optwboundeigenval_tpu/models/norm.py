"""BatchNorm with torch's exact running-statistics semantics.

flax ``nn.BatchNorm`` accumulates the BIASED batch variance into
``running_var``; torch's ``_BatchNorm`` stores the UNBIASED one
(``var * n / (n - 1)``, where ``n`` is the per-feature element count).
Normalization itself uses the biased variance in train mode on both
sides, so forwards, gradients, and curvature (HVP / vGHv) are already
identical — the difference only surfaces through EVAL-mode forwards
after training steps, where it produces a systematic ~1e-4-scale eval-
loss drift against the reference (larger for deep layers with small
spatial dims: at n = 16 the correction is 6.7% of the update).  Found
by the cxr_f64 head-to-head: parameters matched to 1.85e-10 while the
epoch eval loss differed by 1.4e-4 — params couldn't explain it, the
running-var semantics did (PARITY_RUNS.md).

``BatchNorm`` below is flax's own implementation (flax 0.12
normalization.py) with the one-line unbiased correction, so it is a
drop-in: same variable names/shapes ("batch_stats" {mean, var}), same
dtype rules, same API — the torch<->flax converters and every
checkpoint stay valid.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from flax import linen as nn
from flax.linen import normalization as _fnorm

# the subclass below vendors flax 0.12's BatchNorm.__call__ body and
# calls these private helpers; fail loudly (with guidance) if a flax
# upgrade moves them rather than silently diverging at apply time
for _helper in ("_canonicalize_axes", "_compute_stats", "_normalize"):
    if not hasattr(_fnorm, _helper):  # pragma: no cover - flax upgrade
        raise ImportError(
            f"flax.linen.normalization.{_helper} is gone: models/norm.py "
            "vendors the flax 0.12 BatchNorm internals and must be "
            "re-synced against this flax version "
            "(pyproject pins flax>=0.12,<0.13)"
        )


class BatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` storing torch's unbiased ``running_var``.

    Reference semantics: torch ``_BatchNorm`` (batchnorm.py) updates
    ``running_var`` with ``var(input, unbiased=True)``; the reference's
    models (densenet.py:19-66, dnet.py, dcnn.py) all rely on it through
    ``nn.BatchNorm2d``.
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        use_running_average = nn.merge_param(
            "use_running_average",
            self.use_running_average,
            use_running_average,
        )
        feature_axes = _fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes
        )
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats",
            "mean",
            lambda s: jnp.zeros(
                s,
                jnp.float32
                if self.force_float32_reductions
                else self.param_dtype,
            ),
            feature_shape,
        )
        ra_var = self.variable(
            "batch_stats",
            "var",
            lambda s: jnp.ones(
                s,
                jnp.float32
                if self.force_float32_reductions
                else self.param_dtype,
            ),
            feature_shape,
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            if mask is not None and self.axis_name is not None and (
                not self.is_initializing()
            ):
                # flax's _compute_stats syncs masked stats with an
                # UNWEIGHTED lax.pmean of per-device means — not the
                # pooled statistic when per-device unmasked counts
                # differ, so no count can make the Bessel correction
                # consistent with it.  Pool sums/counts across devices
                # instead (torch SyncBatchNorm semantics): stats AND
                # count then describe the same population
                stat_dtype = jnp.result_type(x) if self.dtype is None \
                    else self.dtype
                if self.force_float32_reductions:
                    stat_dtype = jnp.promote_types(stat_dtype, jnp.float32)
                xs = x.astype(stat_dtype)
                m = jnp.broadcast_to(jnp.asarray(mask, bool), x.shape)
                cnt = jnp.sum(m, axis=reduction_axes, dtype=stat_dtype)
                s1 = jnp.sum(jnp.where(m, xs, 0), axis=reduction_axes)
                s2 = jnp.sum(jnp.where(m, xs * xs, 0), axis=reduction_axes)
                cnt, s1, s2 = (
                    lax.psum(
                        t,
                        axis_name=self.axis_name,
                        axis_index_groups=self.axis_index_groups,
                    )
                    for t in (cnt, s1, s2)
                )
                n = cnt
                mean = s1 / jnp.maximum(cnt, 1.0)
                var = jnp.maximum(0.0, s2 / jnp.maximum(cnt, 1.0)
                                  - mean * mean)
            else:
                mean, var = _fnorm._compute_stats(
                    x,
                    reduction_axes,
                    dtype=self.dtype,
                    axis_name=self.axis_name
                    if not self.is_initializing()
                    else None,
                    axis_index_groups=self.axis_index_groups,
                    use_fast_variance=self.use_fast_variance,
                    mask=mask,
                    force_float32_reductions=self.force_float32_reductions,
                )
                # per-feature element count behind the Bessel
                # correction.  Must match the statistics' population:
                # mask limits it to the unmasked elements (per-feature
                # counts), axis_name/axis_index_groups sum it across
                # the syncing devices.  torch raises on n == 1
                # ("Expected more than 1 value per channel") — clamp
                # instead of divide-by-zero
                if mask is None:
                    n = 1.0
                    for ax in reduction_axes:
                        n *= x.shape[ax]
                    n = jnp.asarray(n, var.dtype)
                else:
                    n = jnp.sum(
                        jnp.broadcast_to(mask, x.shape),
                        axis=reduction_axes,
                        dtype=var.dtype,
                    )
                if self.axis_name is not None and (
                    not self.is_initializing()
                ):
                    n = lax.psum(
                        n,
                        axis_name=self.axis_name,
                        axis_index_groups=self.axis_index_groups,
                    )

            if not self.is_initializing():
                n = jnp.asarray(n, var.dtype)
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * unbiased
                )

        return _fnorm._normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )
