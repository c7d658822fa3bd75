"""Optimizer-protocol head-to-head vs the ACTUAL reference optimizers
(sam.py, optim.py — executed as-is, torch CPU).

One deterministic step on the Forest MLP at identical torch-init
weights and an identical batch: the updated parameter trees must agree
to f32 tolerance.  EntropySGD runs with eps=0 (no Langevin noise) so
the inner SGLD mean-dynamics are deterministic on both sides.
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


def _setup(torch, seed=0):
    """Reference Net + converted flax params + one pinned batch."""
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net

    torch.manual_seed(seed)
    model = Net()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(64, 54)).astype(np.float32)
    y = rng.integers(0, 7, size=64).astype(np.int64)

    import jax

    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    p0, _ = task.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), p0, convert_forest(sd)
    )
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y.astype(np.int32)),
        "w": jnp.ones(64, jnp.float32),
    }
    loss_fn = task.loss_fn({}, None)
    return model, (x, y), params, batch, loss_fn


def _assert_trees_match(torch_model, jax_params, rtol=2e-5, atol=1e-6):
    from benchmarks.parity.jax_driver import convert_forest

    sd = {k: v.detach().numpy().copy()
          for k, v in torch_model.state_dict().items()}
    expect = convert_forest(sd)
    for layer in expect:
        for leaf in expect[layer]:
            np.testing.assert_allclose(
                np.asarray(jax_params[layer][leaf]), expect[layer][leaf],
                rtol=rtol, atol=atol, err_msg=f"{layer}/{leaf}",
            )


def test_sam_one_step_parity(ref_env):
    """SAM two-pass protocol (sam.py:17-40, opt.py:688-694): perturb by
    rho*g/|g|, re-grad at the perturbed point, restore, base-SGD step."""
    torch = ref_env
    import torch.nn as nn

    import jax

    from sam import SAM as RefSAM

    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.optim.sam import SAM

    for adaptive in (False, True):
        model, (x, y), params, batch, loss_fn = _setup(torch, seed=1)
        x_t, y_t = torch.from_numpy(x), torch.from_numpy(y)
        crit = nn.CrossEntropyLoss()

        ref_opt = RefSAM(model.parameters(), torch.optim.SGD, rho=0.05,
                         adaptive=adaptive, lr=0.1)
        model.zero_grad()
        crit(model(x_t), y_t).backward()
        ref_opt.first_step(zero_grad=True)
        crit(model(x_t), y_t).backward()
        ref_opt.second_step()

        opt = SAM(sgd(0.1), rho=0.05, adaptive=adaptive)
        state = opt.init(params)
        grad_fn = lambda p: jax.value_and_grad(loss_fn)(p, batch)
        _, g = grad_fn(params)
        new_params, _ = opt.step(g, state, params, grad_fn=grad_fn)

        _assert_trees_match(model, new_params)


def test_entropy_sgd_one_step_parity(ref_env):
    """EntropySGD (optim.py:21-104) with eps=0: L deterministic inner
    SGLD steps (recomputed gradients — the upstream closure protocol),
    anchor restore, outer nesterov-momentum step on w - <w>, with the
    reference's first-step momentum warm start (optim.py:43-46)."""
    torch = ref_env
    import torch.nn as nn

    import jax

    from optim import EntropySGD as RefEntropySGD

    from optwboundeigenval_tpu.optim.entropy_sgd import EntropySGD

    model, (x, y), params, batch, loss_fn = _setup(torch, seed=2)
    x_t, y_t = torch.from_numpy(x), torch.from_numpy(y)
    crit = nn.CrossEntropyLoss()

    cfg = dict(lr=0.1, momentum=0.9, damp=0.0, weight_decay=0.0,
               nesterov=True, L=3, eps=0.0, g0=1e-2, g1=1e-3)
    ref_opt = RefEntropySGD(model.parameters(), dict(cfg))

    def closure():
        model.zero_grad()
        loss = crit(model(x_t), y_t)
        loss.backward()
        return loss, 0.0

    ref_opt.step(closure=closure, model=model, criterion=crit)

    opt = EntropySGD(recompute_grads=True, **cfg)
    state = opt.init(params)
    grad_fn = lambda p: jax.value_and_grad(loss_fn)(p, batch)
    _, g = grad_fn(params)
    new_params, _ = opt.step(
        g, state, params, grad_fn=grad_fn, rng=jax.random.PRNGKey(0)
    )

    _assert_trees_match(model, new_params)


def test_kfac_one_step_parity(ref_env):
    """KFACOptimizer head-to-head (kfac.py, executed as-is): identity-
    seeded running factors, eigendecomposed inverses, natural gradient,
    KL clip, momentum step — one step with TCov=TInv=1 on the Forest
    MLP (including its fc2-applied-twice weight reuse) must produce the
    same updated parameters."""
    torch = ref_env
    import torch.nn as nn

    import jax

    from kfac import KFACOptimizer as RefKFAC

    from optwboundeigenval_tpu.ops import kfac as kfac_ops
    from optwboundeigenval_tpu.optim.kfac_optimizer import KFAC

    model, (x, y), params, batch, loss_fn = _setup(torch, seed=3)
    x_t, y_t = torch.from_numpy(x), torch.from_numpy(y)
    crit = nn.CrossEntropyLoss()

    hp = dict(lr=0.1, momentum=0.9, stat_decay=0.95, damping=0.001,
              kl_clip=0.001, weight_decay=0.0, TCov=1, TInv=1,
              batch_averaged=True)
    ref_opt = RefKFAC(model, **hp)
    ref_opt.acc_stats = True
    model.zero_grad()
    crit(model(x_t), y_t).backward()
    ref_opt.step()

    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    opt = KFAC(kfac_rand=False, **hp)
    state = opt.init(params)
    state = opt.build_extra_state(
        state, task, params, {}, batch, jax.random.PRNGKey(0)
    )
    grad_fn = lambda p: jax.value_and_grad(loss_fn)(p, batch)
    _, g = grad_fn(params)

    def stats_fn(p, r):
        _, caps = kfac_ops.capture(
            task, p, {}, batch, r, sample_targets=False
        )
        return caps

    new_params, _ = opt.step(
        g, state, params, grad_fn=grad_fn,
        rng=jax.random.PRNGKey(1), stats_fn=stats_fn,
    )

    _assert_trees_match(model, new_params, rtol=5e-4, atol=5e-6)


def test_asymmetric_valley_epochs_parity(ref_env, tmp_path):
    """AsymmetricValley SWA phase head-to-head (asymmetric_valley.py,
    executed as-is): 4 epochs on the Forest MLP with the trapezoid
    schedule and SWA averaging from epoch 2 — per-epoch train loss, the
    SGD parameters, AND the SWA average must match."""
    torch = ref_env
    import torch.nn as nn
    import torch.utils.data as utils_data

    from benchmarks.parity.jax_driver import convert_forest

    model, (x, y), params, batch, loss_fn = _setup(torch, seed=4)
    n = 256
    rng = np.random.default_rng(11)
    xb = rng.normal(size=(n, 54)).astype(np.float32)
    yb = rng.integers(0, 7, size=n).astype(np.int64)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from asymmetric_valley import AsymmetricValley

        topt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9)
        av = AsymmetricValley(
            model, nn.CrossEntropyLoss(), topt, batch_size=64,
            swa=True, swa_start=2, sgd_start=100, swa_c_epochs=1,
            swa_lr=0.05, eval_freq=1, save_freq=100, max_iter=4,
        )
        ds = utils_data.TensorDataset(
            torch.from_numpy(xb), torch.from_numpy(yb)
        )
        av.dataloader = utils_data.DataLoader(ds, batch_size=64,
                                              shuffle=False)
        ref_f = []
        for i in range(4):
            av.i = i
            av.iter()
            ref_f.append(float(av.f))
    finally:
        os.chdir(cwd)

    # ---- ours ----
    import jax

    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.train.asymmetric_valley import (
        AsymmetricValleyTrainer,
    )
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = AsymmetricValleyTrainer(
        task, sgd(0.1, momentum=0.9), swa=True, swa_start=2,
        sgd_start=100, swa_c_epochs=1, swa_lr=0.05, eval_freq=1,
        save_freq=100, max_iter=4, batch_size=64, header="AVPAR",
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    loader = ArrayLoader(xb, yb.astype(np.int32), batch_size=64,
                         shuffle=False)
    tr.init_state(next(iter(loader)))
    tr.params = params
    jax_f = []
    for i in range(4):
        tr.i = i
        tr.iter_epoch(loader)
        jax_f.append(float(tr.f))

    np.testing.assert_allclose(jax_f, ref_f, rtol=2e-5)
    _assert_trees_match(av.model, tr.params, rtol=5e-5, atol=1e-6)

    # SWA average (2 averaging events: epochs 2 and 3 -> swa_n == 2)
    assert tr.swa_n == av.swa_n == 3
    sd_swa = {k: v.detach().numpy().copy()
              for k, v in av.swa_model.state_dict().items()}
    expect = convert_forest(sd_swa)
    for layer in expect:
        for leaf in expect[layer]:
            np.testing.assert_allclose(
                np.asarray(tr.swa_params[layer][leaf]), expect[layer][leaf],
                rtol=5e-5, atol=1e-6, err_msg=f"swa {layer}/{leaf}",
            )


def test_lobpcg_preconditioned_rho_parity(ref_env, tmp_path):
    """K-FAC-preconditioned (inexact LOBPCG) power iteration h2h
    (opt.py:348-416, 426-430, 491-493): identical weights/batch, true
    targets (kfac_rand=False) — the preconditioned eigensolve must
    produce the same rho, iteration count, and residual norm as the
    reference's comp_rho with lobpcg=True."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    torch.manual_seed(14)
    model = Net()
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
    rng = np.random.default_rng(14)
    x = rng.normal(size=(64, 54)).astype(np.float32)
    y = rng.integers(0, 7, size=64).astype(np.int64)

    ref = ref_opt.OptWBoundEignVal(
        model, nn.CrossEntropyLoss(),
        torch.optim.SGD(model.parameters(), lr=0.1),
        batch_size=64, max_iter=1, use_gpu=False,
        pow_iter_eps=1e-3, max_pow_iter=50, ignore_bad_vals=False,
        lobpcg=True, kfac_rand=False,
    )
    iters_ref, rn_ref, _ = ref.comp_rho(
        [torch.from_numpy(x), torch.from_numpy(y)]
    )
    rho_ref, norm_ref = float(ref.rho), float(ref.norm)

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = SpectralTrainer(
        task, sgd(0.1), batch_size=64, pow_iter_eps=1e-3,
        max_pow_iter=50, ignore_bad_vals=False, lobpcg=True,
        kfac_rand=False, header="LOBPAR",
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    loader = ArrayLoader(x, y.astype(np.int32), batch_size=64,
                         shuffle=False)
    batch0 = next(iter(loader))
    tr.init_state(batch0)
    tr.params = jax.tree.map(
        lambda t, v: jnp.asarray(v, t.dtype), tr.params, convert_forest(sd)
    )
    self_rng, r = jax.random.split(tr.rng)
    tr._refresh_precond(tr._put_batch(batch0), r)
    tr.rho_test(loader=loader)
    csv = np.loadtxt(
        str(tmp_path / "logs" / f"{tr.header2}_rho_test.csv"),
        delimiter=",",
    ).reshape(-1, 6)

    np.testing.assert_allclose(csv[0, 1], rho_ref, rtol=1e-4,
                               err_msg="rho")
    assert int(csv[0, 3]) == int(iters_ref) + 1, (csv[0, 3], iters_ref)
    np.testing.assert_allclose(csv[0, 2], norm_ref, rtol=1e-2, atol=1e-6,
                               err_msg="norm")


def test_damped_alpha_rho_parity(ref_env, tmp_path):
    """Damped power-iteration update v <- v + alpha*(Hv - v)
    (opt.py:489-495) with a scalar alpha AND a callable schedule:
    rho/iters must match the reference comp_rho."""
    torch = ref_env
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from benchmarks.parity.jax_driver import convert_forest
    from forest_data import Net
    import opt as ref_opt

    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.ops import curvature, eigen
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax
    from optwboundeigenval_tpu.utils.tree import tree_uniform_like

    rng = np.random.default_rng(15)
    x = rng.normal(size=(64, 54)).astype(np.float32)
    y = rng.integers(0, 7, size=64).astype(np.int64)

    for alpha, jalpha in (
        (0.5, 0.5),
        (lambda i: 1.0 / (1.0 + 0.1 * i),
         lambda i: 1.0 / (1.0 + 0.1 * i.astype(jnp.float32))),
    ):
        torch.manual_seed(15)
        model = Net()
        sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}
        ref = ref_opt.OptWBoundEignVal(
            model, nn.CrossEntropyLoss(),
            torch.optim.SGD(model.parameters(), lr=0.1),
            batch_size=64, max_iter=1, use_gpu=False,
            pow_iter_eps=1e-3, max_pow_iter=60, ignore_bad_vals=False,
            pow_iter_alpha=alpha,
        )
        iters_ref, _, _ = ref.comp_rho(
            [torch.from_numpy(x), torch.from_numpy(y)]
        )

        task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
        p0, _ = task.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = jax.tree.map(
            lambda t, v: jnp.asarray(v, t.dtype), p0, convert_forest(sd)
        )
        batch = {
            "x": jnp.asarray(x),
            "y": jnp.asarray(y.astype(np.int32)),
            "w": jnp.ones(64, jnp.float32),
        }
        loss_fn = task.loss_fn({}, None)
        _, hvp_fn = curvature.linearize_hvp(loss_fn, params, batch)
        res = eigen.estimate_dominant_eig(
            hvp_fn, tree_uniform_like(params), eps=1e-3, max_iter=60,
            alpha=jalpha, ignore_bad_vals=False,
        )
        np.testing.assert_allclose(
            float(res.rho), float(ref.rho), rtol=1e-4,
            err_msg=f"alpha={alpha}",
        )
        assert int(res.iters) == int(iters_ref) + 1


def test_entropy_sgd_inloop_stale_closure_parity(ref_env):
    """The reference's IN-LOOP EntropySGD protocol (opt.py:672-686,
    pow_iter=False — its only shipped configuration): the closure
    returns the cached loss and never recomputes gradients, so the
    inner SGLD integrates the stale (in-place mutated) gradient field.
    Our ``recompute_grads=False`` mode must reproduce the multi-step
    trajectory exactly (eps=0)."""
    torch = ref_env
    import torch.nn as nn

    import jax

    from optim import EntropySGD as RefEntropySGD

    from optwboundeigenval_tpu.optim.entropy_sgd import EntropySGD

    model, (x, y), params, batch, loss_fn = _setup(torch, seed=16)
    crit = nn.CrossEntropyLoss()

    cfg = dict(lr=0.1, momentum=0.9, damp=0.0, weight_decay=0.0,
               nesterov=True, L=3, eps=0.0, g0=1e-2, g1=1e-3)
    ref_opt = RefEntropySGD(model.parameters(), dict(cfg))

    rng = np.random.default_rng(16)
    batches = []
    for _ in range(3):
        xb = rng.normal(size=(64, 54)).astype(np.float32)
        yb = rng.integers(0, 7, size=64).astype(np.int64)
        batches.append((xb, yb))

    # reference in-loop protocol: fresh forward/backward, then step
    # with the cached-value closure (opt.py:675-686)
    for xb, yb in batches:
        ref_opt.zero_grad()
        out = model(torch.from_numpy(xb))
        loss = crit(out, torch.from_numpy(yb))
        loss.backward()
        ref_opt.step(lambda: (loss.item(), 0.0), model, crit)

    import jax.numpy as jnp

    opt = EntropySGD(recompute_grads=False, **cfg)
    state = opt.init(params)
    for i, (xb, yb) in enumerate(batches):
        b = {
            "x": jnp.asarray(xb),
            "y": jnp.asarray(yb.astype(np.int32)),
            "w": jnp.ones(64, jnp.float32),
        }
        grad_fn = lambda p: jax.value_and_grad(loss_fn)(p, b)
        _, g = grad_fn(params)
        params, state = opt.step(
            g, state, params, grad_fn=grad_fn,
            rng=jax.random.PRNGKey(i),
        )

    _assert_trees_match(model, params, rtol=1e-4, atol=2e-6)


def test_scheduler_families_parity(ref_env):
    """Per-epoch lr sequences vs the torch schedulers the reference
    constructs (params/ files use LambdaLR/ExponentialLR/
    CosineAnnealingLR/ReduceLROnPlateau on SGD)."""
    torch = ref_env

    from optwboundeigenval_tpu.optim import schedules

    def torch_lrs(make_sched, metrics=None, n=12):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.5)
        sched = make_sched(opt)
        out = []
        for i in range(n):
            if metrics is not None:
                sched.step(metrics[i])
            else:
                sched.step()
            out.append(opt.param_groups[0]["lr"])
        return out

    def our_lrs(sched, metrics=None, n=12):
        return [
            sched.step(metrics[i] if metrics is not None else None)
            for i in range(n)
        ]

    # LambdaLR 1/(1+k) (params/forest_best.py)
    np.testing.assert_allclose(
        our_lrs(schedules.LambdaLR(0.5, lambda k: 1 / (1 + k))),
        torch_lrs(lambda o: torch.optim.lr_scheduler.LambdaLR(
            o, lr_lambda=lambda k: 1 / (1 + k))),
        rtol=1e-12,
    )
    # ExponentialLR
    np.testing.assert_allclose(
        our_lrs(schedules.ExponentialLR(0.5, gamma=0.9)),
        torch_lrs(lambda o: torch.optim.lr_scheduler.ExponentialLR(
            o, gamma=0.9)),
        rtol=1e-10,
    )
    # CosineAnnealingLR
    np.testing.assert_allclose(
        our_lrs(schedules.CosineAnnealingLR(0.5, T_max=10)),
        torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
            o, T_max=10)),
        rtol=1e-6, atol=1e-12,
    )
    # ReduceLROnPlateau on a plateauing loss sequence
    metrics = [1.0, 0.8, 0.7, 0.7, 0.7, 0.7, 0.7, 0.7, 0.65, 0.65,
               0.65, 0.65]
    np.testing.assert_allclose(
        our_lrs(schedules.ReduceLROnPlateau(0.5, factor=0.5, patience=3),
                metrics=metrics),
        torch_lrs(lambda o: torch.optim.lr_scheduler.ReduceLROnPlateau(
            o, factor=0.5, patience=3), metrics=metrics),
        rtol=1e-10,
    )


def test_asymmetric_valley_iter2_interpolation_parity(ref_env, tmp_path):
    """AsymmetricValley post-SWA phase h2h: iter2's SGD hunt (incl. the
    reference's quirk of reloading the checkpoint's plain state_dict)
    and the full SGD<->SWA linear interpolation sweep — the four
    results arrays must match."""
    torch = ref_env
    import torch.nn as nn
    import torch.utils.data as utils_data

    from benchmarks.parity.jax_driver import convert_forest

    model, _, params, _, _ = _setup(torch, seed=22)
    rng = np.random.default_rng(23)
    xb = rng.normal(size=(256, 54)).astype(np.float32)
    yb = rng.integers(0, 7, size=256).astype(np.int64)
    xv = rng.normal(size=(128, 54)).astype(np.float32)
    yv = rng.integers(0, 7, size=128).astype(np.int64)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    os.makedirs("models", exist_ok=True)
    os.makedirs("logs", exist_ok=True)
    os.makedirs("plots", exist_ok=True)
    try:
        from asymmetric_valley import AsymmetricValley, save_checkpoint

        topt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9)
        av = AsymmetricValley(
            model, nn.CrossEntropyLoss(), topt, batch_size=64,
            swa=True, swa_start=2, sgd_start=100, swa_c_epochs=1,
            swa_lr=0.05, eval_freq=1, save_freq=2, max_iter=4,
            division_part=4, distances=2,
        )
        ds = utils_data.TensorDataset(torch.from_numpy(xb),
                                      torch.from_numpy(yb))
        av.dataloader = utils_data.DataLoader(ds, batch_size=64,
                                              shuffle=False)
        vds = utils_data.TensorDataset(torch.from_numpy(xv),
                                       torch.from_numpy(yv))
        vloader = utils_data.DataLoader(vds, batch_size=64,
                                        shuffle=False)
        for i in range(4):
            av.i = i
            av.iter()
        av.i = 4
        av.iter2(vloader)
        if av.sgd_path is None:
            # force an SGD point so the interpolation runs
            av.sgd_path = save_checkpoint(
                av.dir, 99, state_dict=av.model.state_dict(),
                optimizer=av.optimizer.state_dict(),
            )
        av.interpolation(vloader)
        ref_results = {
            k: np.loadtxt(f"logs/asymmetric_valley_{k}_results.txt")
            for k in ("train_loss", "test_loss", "train_acc", "test_acc")
        }
        ref_sgd_saved = "checkpoint-99" not in (av.sgd_path or "")
    finally:
        os.chdir(cwd)

    # ---- ours ----
    import jax

    from optwboundeigenval_tpu.data.loaders import ArrayLoader
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import Task
    from optwboundeigenval_tpu.train.asymmetric_valley import (
        AsymmetricValleyTrainer,
    )
    from optwboundeigenval_tpu.train.task import cross_entropy_double_softmax

    task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
    tr = AsymmetricValleyTrainer(
        task, sgd(0.1, momentum=0.9), swa=True, swa_start=2,
        sgd_start=100, swa_c_epochs=1, swa_lr=0.05, eval_freq=1,
        save_freq=2, max_iter=4, division_part=4, distances=2,
        batch_size=64, header="AVI2",
        log_dir=str(tmp_path / "jlogs"), model_dir=str(tmp_path / "jmodels"),
    )
    loader = ArrayLoader(xb, yb.astype(np.int32), batch_size=64,
                         shuffle=False)
    vloader_j = ArrayLoader(xv, yv.astype(np.int32), batch_size=64,
                            shuffle=False)
    tr.init_state(next(iter(loader)))
    tr.params = params
    for i in range(4):
        tr.i = i
        tr.iter_epoch(loader)
    tr.i = 4
    tr.iter2(loader, vloader_j)
    our_sgd_saved = tr.sgd_path is not None
    assert our_sgd_saved == ref_sgd_saved  # same hunt decision
    if tr.sgd_path is None:
        tr.sgd_path = tr._save_full("sgd_ep99")
    tr.interpolation(loader, vloader_j)

    for k in ("train_loss", "test_loss", "train_acc", "test_acc"):
        ours = np.loadtxt(
            str(tmp_path / "jlogs" / f"asymmetric_valley_{k}_results.txt")
        )
        np.testing.assert_allclose(ours, ref_results[k], rtol=5e-4,
                                   atol=1e-5, err_msg=k)


def test_reference_cannot_train_float64_we_can(ref_env, tmp_path, monkeypatch):
    """Reference limitation found in round 3: the reference cannot
    train a double-precision model AS-IS — ``iter()`` hard-casts the
    assembled update direction to f32 before assigning it
    (``param.grad = p[i:i+n].view(s).float()``, opt.py:658), and torch
    rejects an f32 gradient on an f64 parameter.  Its HVPOperator
    computes curvature in f64 (opt.py:83) but the training path
    silently rounds every applied step through f32 even for f32
    models.  This framework trains the identical recipe fully in f64
    under ``jax_enable_x64`` — the strict ``cxr_f64`` head-to-head
    (PARITY_RUNS.md) runs on exactly that support."""
    torch = ref_env
    import torch.nn as nn

    import opt as ref_opt
    from forest_data import Net

    torch.manual_seed(3)
    model = Net().double()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(16, 54)).astype(np.float64)
    y = rng.integers(0, 7, size=16).astype(np.int64)

    monkeypatch.chdir(tmp_path)
    ref = ref_opt.OptWBoundEignVal(
        model, nn.CrossEntropyLoss(),
        torch.optim.SGD(model.parameters(), lr=0.1),
        mu=0.01, K=0.0, batch_size=16, max_iter=1, min_iter=1, eps=-1,
        use_gpu=False, pow_iter_eps=1e-1, max_pow_iter=5, header="F64",
    )
    with pytest.raises(RuntimeError, match="dtype"):
        ref.train(inputs=torch.from_numpy(x), target=torch.from_numpy(y))

    # ours: the same spectral step end-to-end in f64
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        import jax.numpy as jnp

        from optwboundeigenval_tpu.models import ForestNet
        from optwboundeigenval_tpu.optim import sgd
        from optwboundeigenval_tpu.train import SpectralTrainer, Task
        from optwboundeigenval_tpu.train.task import (
            cross_entropy_double_softmax,
        )

        task = Task(model=ForestNet(), loss=cross_entropy_double_softmax)
        tr = SpectralTrainer(
            task, sgd(0.1), mu=0.01, K=0.0, batch_size=16,
            pow_iter_eps=1e-1, max_pow_iter=5, header="F64J",
            log_dir=str(tmp_path / "jlogs"), model_dir=str(tmp_path / "jm"),
            seed=3,
        )
        batch = {"x": jnp.asarray(x), "y": jnp.asarray(y.astype(np.int32)),
                 "w": jnp.ones(16, jnp.float64)}
        tr.init_state(batch)
        # force the f64 state the x64 flag entitles us to (flax init
        # defaults param_dtype=f32)
        tr.params = jax.tree.map(lambda a: a.astype(jnp.float64), tr.params)
        tr.opt_state = jax.jit(tr.optimizer.init)(tr.params)
        from optwboundeigenval_tpu.utils.tree import tree_uniform_like

        tr.v = tree_uniform_like(tr.params)
        m = tr.train_step(batch, fetch=True)
        assert m["step_ok"]
        leaf = jax.tree_util.tree_leaves(tr.params)[0]
        assert leaf.dtype == jnp.float64
        # the committed step really was taken in f64: rho is finite and
        # the eigensolver's stop scalars tracked the operand dtype
        assert np.isfinite(float(m["rho"]))
    finally:
        jax.config.update("jax_enable_x64", False)
