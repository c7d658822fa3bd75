"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4e): the
sharded train step must produce the same math as single-device, with
batches split over the ``data`` axis and XLA inserting the psums."""

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_classification
from optwboundeigenval_tpu.models import ForestNet
from optwboundeigenval_tpu.ops import curvature, eigen
from optwboundeigenval_tpu.optim import sgd
from optwboundeigenval_tpu.parallel import make_mesh, replicate, shard_batch
from optwboundeigenval_tpu.train import SpectralTrainer, Task
from optwboundeigenval_tpu.utils.tree import tree_ravel, tree_uniform_like


def test_mesh_construction(eight_devices):
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_sharded_hvp_matches_single_device(eight_devices):
    """An HVP on a data-sharded batch equals the single-device HVP —
    the psum'd batch reduction is exact."""
    mesh = make_mesh()
    task = Task(model=ForestNet(hidden=8, num_classes=4))
    x, y = make_classification(64, 10, 4, seed=0)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y),
             "w": jnp.ones(64, jnp.float32)}
    params, _ = task.init(jax.random.PRNGKey(0), batch["x"])

    def loss_fn(p, b):
        out = task.model.apply({"params": p}, b["x"], train=True)
        return task.loss(out, b["y"], b["w"])

    v = tree_uniform_like(params)
    hv_single = curvature.hvp(loss_fn, params, batch, v)

    sharded_batch = shard_batch(batch, mesh)
    params_r = replicate(params, mesh)
    v_r = replicate(v, mesh)
    hv_sharded = jax.jit(lambda p, b, vv: curvature.hvp(loss_fn, p, b, vv))(
        params_r, sharded_batch, v_r
    )
    a, _ = tree_ravel(hv_single)
    b, _ = tree_ravel(hv_sharded)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_sharded_eigensolve_matches_single_device(eight_devices):
    mesh = make_mesh()
    task = Task(model=ForestNet(hidden=8, num_classes=4))
    x, y = make_classification(64, 10, 4, seed=1)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y),
             "w": jnp.ones(64, jnp.float32)}
    params, _ = task.init(jax.random.PRNGKey(0), batch["x"])

    def loss_fn(p, b):
        out = task.model.apply({"params": p}, b["x"], train=True)
        return task.loss(out, b["y"], b["w"])

    def solve(p, b):
        _, hvp_fn = curvature.linearize_hvp(loss_fn, p, b)
        return eigen.estimate_dominant_eig(
            hvp_fn, tree_uniform_like(p), eps=1e-6, max_iter=500
        )

    r1 = jax.jit(solve)(params, batch)
    r2 = jax.jit(solve)(replicate(params, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(float(r1.rho), float(r2.rho), rtol=1e-4)


def test_tensor_parallel_params_same_eigensolve(eight_devices):
    """Sharding large kernels over the 'model' axis must not change
    the eigensolve result (XLA inserts the collectives)."""
    from optwboundeigenval_tpu.parallel import shard_params
    from optwboundeigenval_tpu.parallel.sharding import infer_param_specs
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=4, model=2)
    task = Task(model=ForestNet(hidden=16, num_classes=4))
    x, y = make_classification(64, 10, 4, seed=4)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(y),
             "w": jnp.ones(64, jnp.float32)}
    params, _ = task.init(jax.random.PRNGKey(0), batch["x"])

    specs = infer_param_specs(params, mesh, min_elems=64)
    spec_leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)
    )
    assert any(s == P(None, "model") for s in spec_leaves)  # something shards

    def loss_fn(p, b):
        out = task.model.apply({"params": p}, b["x"], train=True)
        return task.loss(out, b["y"], b["w"])

    def solve(p, b):
        _, hvp_fn = curvature.linearize_hvp(loss_fn, p, b)
        return eigen.estimate_dominant_eig(
            hvp_fn, tree_uniform_like(p), eps=1e-6, max_iter=500
        )

    r_rep = jax.jit(solve)(params, batch)
    p_tp = shard_params(params, mesh, min_elems=64)
    r_tp = jax.jit(solve)(p_tp, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(r_rep.rho), float(r_tp.rho), rtol=1e-4)


def test_trainer_with_mesh(tmp_path, eight_devices):
    mesh = make_mesh()
    task = Task(model=ForestNet(hidden=8, num_classes=4))
    x, y = make_classification(256, 10, 4, seed=2)
    loader = ArrayLoader(x, y, batch_size=32, shuffle=True, seed=3)
    tr = SpectralTrainer(
        task,
        sgd(0.1),
        mu=0.01,
        K=1.0,
        batch_size=32,
        max_iter=2,
        min_iter=1,
        max_pow_iter=20,
        pow_iter_eps=1e-2,
        header="MESH",
        mesh=mesh,
        log_dir=str(tmp_path / "logs"),
        model_dir=str(tmp_path / "models"),
    )
    tr.train(train_loader=loader)
    assert np.isfinite(tr.f) and np.isfinite(tr.h)


import pytest

from optwboundeigenval_tpu.optim import EntropySGD, SAM, KFAC


_BREADTH = {
    # every advanced trainer path that had "never executed under a
    # mesh" (round-2 verdict): GSPMD must insert the same collectives
    # (batch-dim psums for grads/HVPs/K-FAC covariance contractions)
    # and reproduce the single-device math exactly.
    "sam": dict(optimizer=lambda: SAM(sgd(0.1), rho=0.05)),
    "entropy_sgd": dict(optimizer=lambda: EntropySGD(lr=0.1, L=3, g0=1e-2)),
    "kfac_opt": dict(optimizer=lambda: KFAC(lr=0.01, TCov=1, TInv=2)),
    "lobpcg": dict(lobpcg=True, kfac_batch=1),
    "defer_metrics": dict(defer_metrics=True),
    "hvp_micro": dict(hvp_micro=2),
    "remat": dict(remat=True),
    # chunked-dispatch scan path: stacked batches shard on axis 1
    # (parallel.shard_stacked_batch); the scanned step must insert the
    # same per-step collectives as the per-batch program
    "scan": dict(defer_metrics=True, scan_steps=2),
    # heavy-ball accelerated eigensolve: its three-term recurrence is
    # pure pytree math, so GSPMD must reproduce single-device exactly
    "momentum": dict(pow_iter_momentum=0.9),
    # Krylov eigensolve: the (m, n) basis is replicated, the HVPs it
    # drives are batch-psum'd — the m-step scan + reorth contractions
    # must reproduce single-device exactly under GSPMD
    "lanczos": dict(eigensolver="lanczos", lanczos_m=8),
    # the adaptive early-exit Krylov solver behind eigensolver='auto'
    # (rand_init forces the many-HVPs regime where it engages)
    "lanczos_adaptive": dict(eigensolver="auto", rand_init=True,
                             lanczos_m=8),
    # buffer donation under GSPMD: aliased input/output shardings are
    # exactly where silent copies (or stale aliased reads) sneak in —
    # the 224px flagship config relies on donate
    "donate": dict(donate=True),
    # the flagship knob set (cxr 224px recipe: remat+defer+donate+scan)
    "donate_scan": dict(donate=True, remat=True, defer_metrics=True,
                        scan_steps=2),
}


@pytest.mark.parametrize("name", sorted(_BREADTH))
def test_mesh_path_matches_single_device(tmp_path, eight_devices, name):
    """Two epochs of each advanced path on the 8-device mesh vs
    unsharded: identical (f, rho, g, params)."""
    kw = dict(_BREADTH[name])
    opt_factory = kw.pop("optimizer", lambda: sgd(0.1))
    x, y = make_classification(128, 10, 4, seed=11)
    batches = list(ArrayLoader(x, y, batch_size=64))

    def run(mesh):
        task = Task(model=ForestNet(hidden=8, num_classes=4))
        tr = SpectralTrainer(
            task, opt_factory(), mu=0.05, K=0.0, batch_size=64,
            max_pow_iter=20, pow_iter_eps=1e-2, ignore_bad_vals=False,
            header=f"BRD{name}", mesh=mesh, seed=5,
            log_dir=str(tmp_path / "logs"),
            model_dir=str(tmp_path / "models"),
            **kw,
        )
        tr.init_state(batches[0])
        for _ in range(2):
            tr.iter_epoch(batches)
        return tr

    a = run(None)
    b = run(make_mesh())
    np.testing.assert_allclose(a.f, b.f, rtol=2e-4)
    np.testing.assert_allclose(a.rho, b.rho, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(a.g, b.g, rtol=2e-4, atol=1e-6)
    ra, _ = tree_ravel(a.params)
    rb, _ = tree_ravel(b.params)
    np.testing.assert_allclose(
        np.asarray(ra), np.asarray(rb), rtol=1e-3, atol=1e-5
    )


def test_flagship_knob_set_conv_model_on_mesh(tmp_path, eight_devices):
    """The 224px flagship recipe's exact knob combination
    (remat + donate + defer_metrics + scan, configs/_cxr_family.py) on
    the REAL conv model family (BC-DenseNet w/ BatchNorm) at tiny
    shapes, 8-device mesh vs single device: identical (f, rho, params).
    GSPMD aliasing + donation over batch-stats pytrees is precisely
    where silent copies / stale aliased reads would sneak in."""
    from optwboundeigenval_tpu.models import DenseNet3

    rng = np.random.default_rng(4)
    # 32px floor: the reference topology ends in a fixed 8x8 avg_pool
    # after two /2 transitions (densenet.py:139)
    x = rng.normal(size=(64, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 4, size=64).astype(np.int32)
    batches = list(ArrayLoader(x, y, batch_size=32))

    def run(mesh):
        task = Task(
            model=DenseNet3(depth=10, growth_rate=4, num_classes=4),
            has_batch_stats=True,
        )
        tr = SpectralTrainer(
            task, sgd(0.05), mu=0.05, K=0.0, batch_size=32,
            max_pow_iter=10, pow_iter_eps=1e-2, ignore_bad_vals=False,
            remat=True, donate=True, defer_metrics=True, scan_steps=2,
            header="FLAG", mesh=mesh, seed=7,
            log_dir=str(tmp_path / "logs"),
            model_dir=str(tmp_path / "models"),
        )
        tr.init_state(batches[0])
        for _ in range(2):
            tr.iter_epoch(batches)
        return tr

    a = run(None)
    b = run(make_mesh())
    # conv+BN f32: the 8-way batch psum reorders accumulation, so the
    # tolerance is looser than the MLP rows' 2e-4 (measured drift ~2e-4)
    np.testing.assert_allclose(a.f, b.f, rtol=1e-3)
    np.testing.assert_allclose(a.rho, b.rho, rtol=1e-3, atol=1e-6)
    ra, _ = tree_ravel(a.params)
    rb, _ = tree_ravel(b.params)
    np.testing.assert_allclose(
        np.asarray(ra), np.asarray(rb), rtol=2e-3, atol=1e-4
    )


def test_host_shard_partitions_exactly():
    """Multi-host input pipeline semantics (SURVEY §2.9): each host's
    strided shard is disjoint and the union covers the dataset exactly
    — validated with explicit (process_index, process_count) pairs
    (real multi-host would pass jax.process_index()/count())."""
    x = np.arange(100, dtype=np.float32).reshape(100, 1)
    y = np.arange(100, dtype=np.int32)
    n_hosts = 4
    seen = []
    for i in range(n_hosts):
        loader = ArrayLoader(x, y, batch_size=8, host_shard=(i, n_hosts))
        rows = []
        for b in loader:
            w = np.asarray(b["w"])
            rows.extend(np.asarray(b["y"])[w > 0].tolist())
        assert len(rows) == 25
        seen.extend(rows)
    assert sorted(seen) == list(range(100))


def test_init_distributed_noop_single_process():
    """init_distributed is a no-op without a coordinator (single
    process); with one it delegates to jax.distributed.initialize."""
    from optwboundeigenval_tpu.parallel import mesh as meshlib

    meshlib.init_distributed()  # must not raise or touch the backend
    called = {}

    orig = jax.distributed.initialize
    try:
        jax.distributed.initialize = lambda **kw: called.update(kw)
        meshlib.init_distributed("10.0.0.1:1234", num_processes=8,
                                 process_id=3)
    finally:
        jax.distributed.initialize = orig
    assert called == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 8,
        "process_id": 3,
    }
