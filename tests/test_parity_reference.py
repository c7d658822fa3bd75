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
