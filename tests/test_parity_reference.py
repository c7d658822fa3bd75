"""CI micro-parity vs the ACTUAL reference implementation.

A 2-epoch miniature of benchmarks/parity/run_parity.py: identical
synthetic data, identical torch init, identical recipe (forest_best:
SGD lr .5 + LambdaLR 1/(1+k), mu .01, K 0 — the band binds every
batch), reference executed as-is from /root/reference (torch CPU).

Skips cleanly when the reference checkout isn't present.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def ref_env():
    from benchmarks.parity import _refenv

    _refenv.install()
    torch = pytest.importorskip("torch")
    return torch


def test_two_epoch_forest_parity(ref_env, tmp_path):
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import _PinnedRng, convert_forest
    from benchmarks.parity.ref_driver import pin_rbatch
    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.data.synthetic import make_classification
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.optim.schedules import LambdaLR
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    # SAME dataset as the full parity run (benchmarks/parity).
    x, y = make_classification(2560, 54, 7, seed=1226)
    x = x.astype(np.float32)

    # ---- reference side (executed as-is) ----
    torch.manual_seed(1226)
    from forest_data import Net

    model = Net()
    # .numpy() aliases the torch parameter memory, which SGD mutates
    # in-place during training — snapshot the init with .copy()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    pin_rbatch()
    import opt as ref_opt

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        topt = torch.optim.SGD(model.parameters(), lr=0.5)
        o = ref_opt.OptWBoundEignVal(
            model, nn.CrossEntropyLoss(), topt,
            scheduler=torch.optim.lr_scheduler.LambdaLR(
                topt, lr_lambda=lambda k: 1.0 / (1.0 + k)
            ),
            mu=0.01, K=0, eps=-1, pow_iter_eps=1e-3,
            batch_size=128, min_iter=2, max_iter=2, max_pow_iter=100,
            ignore_bad_vals=False, header="MICRO",
        )
        try:
            o.train(
                inputs=torch.from_numpy(x),
                target=torch.from_numpy(y.astype(np.int64)),
            )
        except FileNotFoundError:
            pass  # no validation set -> no best checkpoint (opt.py:1069)
        ref_rows = []
        with open(o.log_file) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) == 5 and parts[0].isdigit():
                    ref_rows.append([float(p) for p in parts])
    finally:
        os.chdir(cwd)

    assert len(ref_rows) == 2

    # ---- tpu-framework side ----
    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = SpectralTrainer(
        task,
        sgd(0.5),
        LambdaLR(0.5, lambda k: 1.0 / (1.0 + k)),
        mu=0.01, K=0.0, eps=-1.0, pow_iter_eps=1e-3,
        batch_size=128, min_iter=2, max_iter=2, max_pow_iter=100,
        ignore_bad_vals=False, header="MICRO", seed=1226,
        log_dir=str(tmp_path / "jlogs"), model_dir=str(tmp_path / "jmodels"),
    )
    loader = ArrayLoader(x, y.astype(np.int32), batch_size=128)
    tr.init_state(next(iter(loader)))
    tr.params = jax.tree.map(
        lambda ref, new: jnp.asarray(new, ref.dtype),
        tr.params, convert_forest(sd),
    )
    tr._np_rng = _PinnedRng()
    tr.train(train_loader=loader)

    jax_rows = []
    with open(tr.log_file) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) == 5 and parts[0].isdigit():
                jax_rows.append([float(p) for p in parts])
    assert len(jax_rows) == 2

    for rr, jr in zip(ref_rows, jax_rows):
        # columns: epoch f rho h norm
        np.testing.assert_allclose(jr[1], rr[1], rtol=1e-4)  # f
        np.testing.assert_allclose(jr[2], rr[2], rtol=1e-3)  # rho
        np.testing.assert_allclose(jr[3], rr[3], rtol=1e-3)  # h
    # penalty-active check: K=0 means g = rho > 0 on every batch
    assert all(r[2] > 0 for r in ref_rows)
    assert tr.g > 0


def test_densenet3_bn_kernel_parity(ref_env, tmp_path):
    """BatchNorm-inside-the-Hessian parity (SURVEY 'hard parts'): the
    reference computes curvature with the model in train mode, so BN
    normalizes by (and differentiates through) BATCH statistics
    (opt.py:421, densenet.py).  At identical torch-init weights on one
    batch, the eval/train forwards, loss, power-iteration rho, AND the
    third-order v^T(grad H)v norm must match the reference DenseNet3
    executed as-is."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from densenet import DenseNet3 as RefDenseNet3  # /root/reference
    import opt as ref_opt

    from optwboundeigenval_tpu.models import DenseNet3
    from optwboundeigenval_tpu.ops import curvature, eigen
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.utils.torch_interop import (
        convert_densenet3_state_dict,
    )
    from optwboundeigenval_tpu.utils.tree import tree_ravel, tree_uniform_like

    depth, B = 16, 16
    torch.manual_seed(0)
    tmodel = RefDenseNet3(depth, 10)
    sd = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, size=B).astype(np.int64)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    y_t = torch.from_numpy(y)

    # ---- flax model carrying the exact torch init ----
    task = Task(model=DenseNet3(depth=depth), has_batch_stats=True)
    p0, ms0 = task.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cp, cs = convert_densenet3_state_dict(sd, depth=depth)
    params = jax.tree.map(lambda t, v: jnp.asarray(v, t.dtype), p0, cp)
    model_state = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), ms0, {"batch_stats": cs}
    )

    # eval-mode forward (running stats still at init) — BEFORE any torch
    # train-mode forward mutates the running stats
    tmodel.eval()
    with torch.no_grad():
        out_ref = tmodel(x_t).numpy()
    out_jax = np.asarray(task.predict(params, model_state, {"x": jnp.asarray(x)}))
    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-4, atol=1e-4)

    # train-mode loss (batch statistics)
    tmodel.train()
    loss_ref = float(nn.CrossEntropyLoss()(tmodel(x_t), y_t))
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y.astype(np.int32)),
        "w": jnp.ones(B, jnp.float32),
    }
    loss_fn = task.loss_fn(model_state)
    loss_jax = float(loss_fn(params, batch))
    np.testing.assert_allclose(loss_jax, loss_ref, rtol=1e-5)

    # rho by the reference's own comp_rho (power iteration over HVPs
    # with BN batch stats inside the double backward)
    o = ref_opt.OptWBoundEignVal(
        tmodel, nn.CrossEntropyLoss(),
        torch.optim.SGD(tmodel.parameters(), lr=0.1),
        pow_iter_eps=1e-4, max_pow_iter=60, ignore_bad_vals=False,
    )
    o.comp_rho([x_t, y_t])
    rho_ref = float(o.rho)

    def solve(p, b):
        _, hvp_fn = curvature.linearize_hvp(loss_fn, p, b)
        return eigen.power_iteration(
            hvp_fn, tree_uniform_like(p), eps=1e-4, max_iter=60
        )
    eig = jax.jit(solve)(params, batch)
    np.testing.assert_allclose(float(eig.rho), rho_ref, rtol=5e-3)

    # third-order pass at the SAME eigenvector (the two solvers converge
    # to slightly different v within eps, and vGHv is sensitive to v —
    # so feed the REFERENCE's converged v through our kernel): convert
    # the torch flat vector (parameters() order, OIHW/(out,in) layouts)
    # into our pytree via the same state-dict converter.
    flat_ref_v = o.v.detach().numpy()
    sd_v = dict(sd)  # keep BN running stats for the converter's shape walk
    off = 0
    for name, p in tmodel.named_parameters():
        num = p.numel()
        sd_v[name] = (
            flat_ref_v[off : off + num].reshape(tuple(p.shape)).astype(np.float32)
        )
        off += num
    assert off == flat_ref_v.size
    cv, _ = convert_densenet3_state_dict(sd_v, depth=depth)
    v_ref_tree = jax.tree.map(lambda t, vv: jnp.asarray(vv, t.dtype), p0, cv)

    # Rayleigh quotient of OUR HVP at the reference's v == reference rho
    _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
    hv = jax.jit(lambda v: hvp_fn(v))(v_ref_tree)
    hv_flat, _ = tree_ravel(hv)
    vr_flat, _ = tree_ravel(v_ref_tree)
    lam_same_v = float(jnp.vdot(hv_flat, vr_flat))
    np.testing.assert_allclose(abs(lam_same_v), rho_ref, rtol=1e-3)

    # ||v^T (grad H) v|| — L2 norm is invariant to the flat-vector
    # element ordering (layout transposes are permutations), so it
    # compares across frameworks directly.  KNOWN REFERENCE DEVIATION:
    # torch's native BatchNorm double-backward is second-order exact but
    # its own derivative (the third-order term vGHv consumes) drops the
    # saved-statistics dependencies — replacing nn.BatchNorm2d with the
    # same math composed from torch primitives reproduces OUR value to
    # 12 digits while native torch differs ~0.5-3%
    # (test_bn_triple_backward_exactness below; PARITY.md quirks table).
    o.comp_gradrho()
    gradrho_ref = float(torch.norm(o.gradrho))
    gv = jax.jit(
        lambda p, b, v: curvature.vghv(loss_fn, p, b, v)
    )(params, batch, v_ref_tree)
    flat, _ = tree_ravel(gv)
    gradrho_jax = float(jnp.linalg.norm(flat))
    np.testing.assert_allclose(gradrho_jax, gradrho_ref, rtol=5e-2)


def test_bn_triple_backward_exactness(ref_env):
    """The reference's vGHv through BatchNorm inherits a torch
    native-BN defect: nn.BatchNorm2d's hand-written double-backward is
    exact to second order, but differentiating it AGAIN (the triple
    backward inside vGHv, opt.py:110-152) loses the saved-statistics
    dependencies.  Composing the IDENTICAL math from torch primitives
    (mean/var/rsqrt) restores the exact value — and that exact value is
    what our ``curvature.vghv`` computes (f64 agreement to 12 digits,
    RESULTS.md).  This test pins all three facts on a tiny conv-BN-fc
    model in f32."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp
    import flax.linen as fnn

    import opt as ref_opt
    from optwboundeigenval_tpu.ops import curvature
    from optwboundeigenval_tpu.utils.tree import tree_ravel

    B, C, H = 8, 4, 6
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, H, H, C)).astype(np.float32)
    y = rng.integers(0, 3, size=B).astype(np.int64)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    y_t = torch.from_numpy(y)

    class ManualBN(nn.Module):
        def __init__(self, c, eps=1e-5):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(c))
            self.bias = nn.Parameter(torch.zeros(c))
            self.eps = eps

        def forward(self, z):
            mu = z.mean(dim=(0, 2, 3), keepdim=True)
            var = ((z - mu) ** 2).mean(dim=(0, 2, 3), keepdim=True)
            zhat = (z - mu) / torch.sqrt(var + self.eps)
            return zhat * self.weight.view(1, -1, 1, 1) + self.bias.view(
                1, -1, 1, 1
            )

    class TM(nn.Module):
        def __init__(self, manual):
            super().__init__()
            self.conv = nn.Conv2d(C, 5, 3, padding=1, bias=False)
            self.bn = ManualBN(5) if manual else nn.BatchNorm2d(5)
            self.fc = nn.Linear(5 * H * H, 3)

        def forward(self, z):
            return self.fc(torch.relu(self.bn(self.conv(z))).flatten(1))

    torch.manual_seed(1)
    native = TM(False)
    manual = TM(True)
    manual.conv.weight.data = native.conv.weight.data.clone()
    manual.fc.weight.data = native.fc.weight.data.clone()
    manual.fc.bias.data = native.fc.bias.data.clone()
    native.train(), manual.train()

    nd = sum(p.numel() for p in native.parameters())
    vg = np.random.default_rng(5).normal(size=nd).astype(np.float32)
    vg /= np.linalg.norm(vg)
    vt = torch.from_numpy(vg)

    norms = {}
    for name, m in (("native", native), ("manual", manual)):
        op = ref_opt.HVPOperator(m, [x_t, y_t], nn.CrossEntropyLoss(),
                                 use_gpu=False)
        hv = op.Hv(vt).numpy()
        gr = op.vGHv(vt, storedGrad=True).numpy()
        norms[name] = (np.linalg.norm(hv), np.linalg.norm(gr))

    # Hv (second order) agrees between torch BN implementations...
    np.testing.assert_allclose(norms["native"][0], norms["manual"][0],
                               rtol=1e-4)
    # ...but the triple backward does NOT — the native defect is real
    rel = abs(norms["native"][1] - norms["manual"][1]) / norms["manual"][1]
    assert rel > 1e-3, rel

    # our vghv reproduces the exact (manual-composition) value
    class JM(fnn.Module):
        @fnn.compact
        def __call__(self, z, train=True):
            z = fnn.Conv(5, (3, 3), padding="SAME", use_bias=False)(z)
            z = fnn.BatchNorm(use_running_average=not train, momentum=0.9)(z)
            z = fnn.relu(z)
            return fnn.Dense(3)(z.reshape(z.shape[0], -1))

    jm = JM()
    sdp = {k: v.detach().numpy() for k, v in native.state_dict().items()}
    fcw_hwc = (
        sdp["fc.weight"].reshape(3, 5, H, H).transpose(0, 2, 3, 1).reshape(3, -1).T
    )
    params = {
        "Conv_0": {"kernel": jnp.asarray(sdp["conv.weight"].transpose(2, 3, 1, 0))},
        "BatchNorm_0": {"scale": jnp.asarray(sdp["bn.weight"]),
                        "bias": jnp.asarray(sdp["bn.bias"])},
        "Dense_0": {"kernel": jnp.asarray(fcw_hwc),
                    "bias": jnp.asarray(sdp["fc.bias"])},
    }
    bstats = {"BatchNorm_0": {"mean": jnp.asarray(sdp["bn.running_mean"]),
                              "var": jnp.asarray(sdp["bn.running_var"])}}

    def loss_fn(p, b):
        out = jm.apply({"params": p, "batch_stats": bstats}, b["x"],
                       train=True, mutable=["batch_stats"])[0]
        logp = jax.nn.log_softmax(out)
        return -jnp.mean(logp[jnp.arange(B), b["y"]])

    off = 0

    def take(shape):
        nonlocal off
        n = int(np.prod(shape))
        out = vg[off : off + n].reshape(shape)
        off += n
        return out

    v_conv = take(sdp["conv.weight"].shape).transpose(2, 3, 1, 0)
    v_bnw, v_bnb = take((5,)), take((5,))
    v_fcw = take(sdp["fc.weight"].shape)
    v_fcw_hwc = v_fcw.reshape(3, 5, H, H).transpose(0, 2, 3, 1).reshape(3, -1).T
    v_fcb = take((3,))
    v_tree = {
        "Conv_0": {"kernel": jnp.asarray(v_conv)},
        "BatchNorm_0": {"scale": jnp.asarray(v_bnw), "bias": jnp.asarray(v_bnb)},
        "Dense_0": {"kernel": jnp.asarray(v_fcw_hwc), "bias": jnp.asarray(v_fcb)},
    }
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
    gv = curvature.vghv(loss_fn, params, batch, v_tree)
    gv_norm = float(jnp.linalg.norm(tree_ravel(gv)[0]))
    np.testing.assert_allclose(gv_norm, norms["manual"][1], rtol=1e-4)
