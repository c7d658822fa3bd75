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
