"""Model-level tests: gemm conv path equivalence, structural param
compatibility across conv_impl, forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optwboundeigenval_tpu.models import CNNUSPS, DenseNet3, ForestNet


def test_gemm_and_lax_share_param_structure_and_outputs():
    """conv_impl='gemm' must be a drop-in: identical param tree and
    numerically identical outputs on shared params."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 1))
    lax_model = CNNUSPS(conv_impl="lax")
    gemm_model = CNNUSPS(conv_impl="gemm")
    params = lax_model.init(jax.random.PRNGKey(1), x)["params"]
    # same tree structure -> the lax params load into the gemm model
    gemm_params = gemm_model.init(jax.random.PRNGKey(2), x)["params"]
    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(gemm_params)
    )
    out_lax = lax_model.apply({"params": params}, x)
    out_gemm = gemm_model.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_lax), np.asarray(out_gemm), rtol=1e-5, atol=1e-6
    )


def test_invalid_conv_impl_raises():
    x = jnp.zeros((2, 16, 16, 1))
    with pytest.raises(ValueError, match="conv_impl"):
        CNNUSPS(conv_impl="GEMM").init(jax.random.PRNGKey(0), x)


def test_forest_net_weight_tying():
    """fc2 is applied twice with the same weights (reference quirk,
    forest_data.py:85-86): the param tree has exactly fc1/fc2/fc3."""
    x = jnp.zeros((2, 54))
    params = ForestNet().init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"fc1", "fc2", "fc3"}


def test_densenet3_output_shape_and_param_count():
    x = jnp.zeros((2, 32, 32, 3))
    model = DenseNet3(depth=40, growth_rate=12, num_classes=10)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    # reference DenseNet-40-12-BC has ~0.18M params (densenet.py)
    assert 1.5e5 < n < 3e5


def test_batchnorm_running_stats_match_torch():
    """The custom BatchNorm (models/norm.py) must accumulate torch's
    UNBIASED running_var (torch batchnorm.py semantics — the reference's
    nn.BatchNorm2d models depend on it for eval-mode forwards), while
    flax's stock nn.BatchNorm stores the biased one.  Drive several
    train-mode updates on random batches and compare running stats
    against torch.nn.BatchNorm2d exactly."""
    import torch

    from optwboundeigenval_tpu.models.norm import BatchNorm

    rng = np.random.default_rng(7)
    c = 5
    bn_j = BatchNorm(use_running_average=False, momentum=0.9)
    x0 = jnp.asarray(rng.normal(size=(3, 4, 4, c)).astype(np.float32))
    variables = bn_j.init(jax.random.PRNGKey(0), x0)
    bn_t = torch.nn.BatchNorm2d(c, momentum=0.1)  # torch 0.1 == flax 0.9
    bn_t.train()
    state = variables["batch_stats"]
    for _ in range(4):
        xb = rng.normal(size=(3, 4, 4, c)).astype(np.float32)
        out_j, mut = bn_j.apply(
            {"params": variables["params"], "batch_stats": state},
            jnp.asarray(xb), mutable=["batch_stats"],
        )
        state = mut["batch_stats"]
        out_t = bn_t(torch.from_numpy(xb.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 3, 1, 2),
            out_t.detach().numpy(), rtol=2e-5, atol=2e-5,
        )
    np.testing.assert_allclose(
        np.asarray(state["mean"]), bn_t.running_mean.numpy(),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(state["var"]), bn_t.running_var.numpy(),
        rtol=1e-5, atol=1e-7,
    )
    # eval-mode forwards then agree through the running stats
    xe = rng.normal(size=(2, 4, 4, c)).astype(np.float32)
    bn_j_eval = BatchNorm(use_running_average=True, momentum=0.9)
    out_j = bn_j_eval.apply(
        {"params": variables["params"], "batch_stats": state},
        jnp.asarray(xe),
    )
    bn_t.eval()
    out_t = bn_t(torch.from_numpy(xe.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t.detach().numpy(),
        rtol=2e-5, atol=2e-5,
    )


def test_batchnorm_bessel_count_mask_and_axis_name():
    """The Bessel correction behind the unbiased running_var must count
    the SAME population the statistics are computed over: the unmasked
    elements when ``mask`` is given, and the cross-device total when
    ``axis_name`` syncs the batch statistics (models/norm.py)."""
    from optwboundeigenval_tpu.models.norm import BatchNorm

    rng = np.random.default_rng(3)
    c = 3

    # --- mask: per-feature unmasked counts ---
    bn = BatchNorm(use_running_average=False, momentum=0.9)
    x = jnp.asarray(rng.normal(size=(4, 6, c)).astype(np.float32))
    mask = jnp.asarray(rng.random(size=(4, 6, 1)) > 0.4)
    variables = bn.init(jax.random.PRNGKey(0), x, mask=mask)
    _, mut = bn.apply(
        variables, x, mask=mask, mutable=["batch_stats"]
    )
    xm = np.asarray(x)
    m = np.broadcast_to(np.asarray(mask), xm.shape)
    expected_var = np.ones(c, np.float32)
    for ch in range(c):
        vals = xm[..., ch][m[..., ch]]
        expected_var[ch] = 0.9 * 1.0 + 0.1 * vals.var(ddof=1)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), expected_var,
        rtol=1e-5, atol=1e-6,
    )

    # --- axis_name: count sums over the syncing devices ---
    n_dev, b = 4, 2
    bn_sync = BatchNorm(
        use_running_average=False, momentum=0.9, axis_name="dp"
    )
    xs = jnp.asarray(rng.normal(size=(n_dev, b, 5, c)).astype(np.float32))
    variables = bn_sync.init(jax.random.PRNGKey(0), xs[0])

    def step(xd):
        _, mut = bn_sync.apply(variables, xd, mutable=["batch_stats"])
        return mut["batch_stats"]["var"]

    var_sync = jax.vmap(step, axis_name="dp")(xs)
    # every device stores the same global running_var, with Bessel's
    # n = n_dev * b * 5 (NOT the local b * 5)
    flat = np.asarray(xs).reshape(-1, c)
    expected = 0.9 * 1.0 + 0.1 * flat.var(axis=0, ddof=1)
    for d in range(n_dev):
        np.testing.assert_allclose(
            np.asarray(var_sync[d]), expected, rtol=1e-5, atol=1e-6,
        )


def test_batchnorm_mask_and_axis_name_pools_unequal_counts():
    """mask + axis_name COMBINED with unequal per-device unmasked counts:
    flax's own sync (unweighted pmean of per-device means) is not the
    pooled statistic there, so models/norm.py pools sums/counts across
    devices instead (torch SyncBatchNorm semantics) — stats, Bessel
    count, and train-mode normalization must all describe the one pooled
    population."""
    from optwboundeigenval_tpu.models.norm import BatchNorm

    rng = np.random.default_rng(11)
    n_dev, c = 2, 3
    bn = BatchNorm(use_running_average=False, momentum=0.9, axis_name="dp")
    xs = jnp.asarray(rng.normal(size=(n_dev, 4, 5, c)).astype(np.float32))
    # device 0 keeps most elements, device 1 keeps few: unequal counts
    masks = jnp.asarray(
        np.stack([
            rng.random(size=(4, 5, 1)) > 0.2,
            rng.random(size=(4, 5, 1)) > 0.7,
        ])
    )
    variables = bn.init(jax.random.PRNGKey(0), xs[0], mask=masks[0])

    def step(xd, md):
        out, mut = bn.apply(variables, xd, mask=md, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    out, stats = jax.vmap(step, axis_name="dp")(xs, masks)

    xm = np.asarray(xs)
    mm = np.broadcast_to(np.asarray(masks), xm.shape)
    for ch in range(c):
        vals = xm[..., ch][mm[..., ch]]  # pooled across BOTH devices
        exp_mean = 0.9 * 0.0 + 0.1 * vals.mean()
        exp_var = 0.9 * 1.0 + 0.1 * vals.var(ddof=1)
        exp_out = (xm[..., ch] - vals.mean()) / np.sqrt(
            vals.var(ddof=0) + 1e-5
        )
        for d in range(n_dev):
            np.testing.assert_allclose(
                np.asarray(stats["mean"])[d, ch], exp_mean,
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(stats["var"])[d, ch], exp_var,
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(out)[d, ..., ch], exp_out[d],
                rtol=1e-4, atol=1e-5,
            )


@pytest.mark.parametrize("momentum", [0.9, 0.99])
def test_bn_update_recovers_exact_batch_stats(momentum):
    """AsymmetricValley's bn_update must recover per-batch statistics
    exactly regardless of the layer's EMA momentum (it probes the
    momentum from the module rather than assuming a constant — the
    repo's models use 0.9, flax's default is 0.99)."""
    from flax import linen as fnn

    from optwboundeigenval_tpu.models.norm import BatchNorm
    from optwboundeigenval_tpu.train.asymmetric_valley import bn_update
    from optwboundeigenval_tpu.train.task import Task

    class TinyBN(fnn.Module):
        mom: float

        @fnn.compact
        def __call__(self, x, train=False):
            return BatchNorm(
                use_running_average=not train, momentum=self.mom
            )(x)

    task = Task(model=TinyBN(mom=momentum), has_batch_stats=True)
    rng = np.random.default_rng(int(momentum * 100))
    x0 = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    params, model_state = task.init(jax.random.PRNGKey(0), x0)
    batches = [
        {"x": jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))}
        for _ in range(3)
    ]
    new_state = bn_update(task, params, model_state, batches, lambda b: b)

    per_batch_mean = np.stack(
        [np.asarray(b["x"]).mean(axis=0) for b in batches]
    )
    per_batch_var = np.stack(
        [np.asarray(b["x"]).var(axis=0, ddof=1) for b in batches]
    )
    stats = new_state["batch_stats"]["BatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(stats["mean"]),
        per_batch_mean.mean(axis=0), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]),
        per_batch_var.mean(axis=0), rtol=1e-5, atol=1e-6,
    )
