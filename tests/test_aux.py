"""Auxiliary-subsystem tests (SURVEY.md §5): timing readouts, NaN
rollback, full-state checkpoint/resume, golden-run regression."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from optwboundeigenval_tpu.data.loaders import ArrayLoader
from optwboundeigenval_tpu.data.synthetic import make_classification
from optwboundeigenval_tpu.models import ForestNet
from optwboundeigenval_tpu.optim import sgd
from optwboundeigenval_tpu.train import SpectralTrainer, Task
from optwboundeigenval_tpu.utils.timing import Timers, time_hms


def test_time_hms_format():
    s = time_hms(3723.5, "Iteration ")
    assert s == "Iteration Time elapsed:  1 hrs,  2 min, 3.50 sec"


def test_timers_accumulate():
    t = Timers()
    with t("a"):
        pass
    with t("a"):
        pass
    assert t.totals["a"] >= 0
    assert "a Time elapsed" in t.report()


def _trainer(tmp_path, **kw):
    x, y = make_classification(128, 8, 3, seed=0)
    loader = ArrayLoader(x, y, 32, shuffle=True, seed=1)
    defaults = dict(
        mu=0.01, K=1.0, batch_size=32, max_iter=2, min_iter=1,
        max_pow_iter=15, pow_iter_eps=1e-2, header="AUX",
        log_dir=str(tmp_path / "logs"), model_dir=str(tmp_path / "models"),
    )
    defaults.update(kw)
    tr = SpectralTrainer(Task(model=ForestNet(hidden=8, num_classes=3)),
                         sgd(0.1), **defaults)
    return tr, loader


def test_verbose_log_includes_timing(tmp_path):
    tr, loader = _trainer(tmp_path, verbose=True)
    tr.train(train_loader=loader)
    content = open(tr.verbose_log_file).read()
    assert "batch\t rho\t norm\t gradf\t gradg" in content
    assert "G Time elapsed" in content
    assert "Iteration Time elapsed" in content


def test_nan_rollback_skips_poisoned_step(tmp_path):
    """A batch that produces non-finite gradients must not poison the
    parameters (reference rollback, opt.py:696-708)."""
    x, y = make_classification(96, 8, 3, seed=0)
    x[32:64] = np.nan  # one poisoned batch
    loader = ArrayLoader(x, y, 32, shuffle=False)
    tr, _ = _trainer(tmp_path, header="NAN", max_iter=1)
    tr.train(train_loader=loader)
    flat = np.concatenate(
        [np.ravel(p) for p in jax.tree_util.tree_leaves(tr.params)]
    )
    assert np.all(np.isfinite(flat))


def test_full_checkpoint_resume(tmp_path):
    tr, loader = _trainer(tmp_path, header="RES")
    tr.train(train_loader=loader)
    tr.save_full()
    f_ref = tr.f

    tr2, _ = _trainer(tmp_path, header="RES")
    tr2.init_state(next(iter(loader)))
    tr2.resume()
    assert tr2.i == tr.i
    # identical params -> identical eval loss
    l1 = tr.test_model(loader=loader)[0]
    l2 = tr2.test_model(loader=loader)[0]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    # optimizer state restored (momentum-free sgd has inner state trees)
    chex_leaves = jax.tree_util.tree_leaves(tr2.opt_state)
    assert len(chex_leaves) == len(jax.tree_util.tree_leaves(tr.opt_state))


def test_remat_and_micro_hvp_match_default(tmp_path):
    """remat=True and hvp_micro>1 change memory behavior, not math:
    the first-epoch trajectory must match the default path."""
    runs = {}
    for name, kw in (
        ("default", {}),
        ("remat", {"remat": True}),
        ("micro", {"hvp_micro": 2}),
    ):
        tr, loader = _trainer(tmp_path, header=f"MEM{name}", max_iter=1)
        loader._rng = np.random.default_rng(3)
        tr.train(train_loader=loader)
        runs[name] = (tr.f, tr.rho)
    np.testing.assert_allclose(runs["default"][0], runs["remat"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(runs["default"][0], runs["micro"][0],
                               rtol=1e-4)
    np.testing.assert_allclose(runs["default"][1], runs["micro"][1],
                               rtol=1e-3)


def test_legacy_train_utils(tmp_path):
    """Legacy standalone loop parity (dcnn.py:418-579 surface)."""
    from optwboundeigenval_tpu.optim import sgd as make_sgd
    from optwboundeigenval_tpu.train import Task, legacy

    x, y = make_classification(96, 8, 3, seed=0)
    loader = ArrayLoader(x, y, 32)
    task = Task(model=ForestNet(hidden=8, num_classes=3))
    params, ms = task.init(jax.random.PRNGKey(0),
                           jnp.asarray(x[:32]))
    opt = make_sgd(0.2)
    opt_state = opt.init(params)
    loss0, _ = legacy.validate(task, params, ms, loader)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        params, ms, opt_state, avg = legacy.train_epoch(
            task, params, ms, opt, opt_state, loader, rng
        )
    loss1, acc1 = legacy.validate(task, params, ms, loader)
    assert loss1 < loss0
    m = legacy.AverageMeter()
    m.update(1.0, 2)
    m.update(2.0, 2)
    assert m.avg == 1.5
    p = legacy.save_checkpoint_copy_on_best(
        {"params": params}, True,
        path=str(tmp_path / "ck.msgpack"),
    )
    assert os.path.exists(p) and p.endswith("_best.msgpack")


def test_golden_run_regression(tmp_path):
    """Deterministic seeds give a reproducible (f, rho) trajectory —
    the golden-run tier of SURVEY.md §4d.  Guards against silent
    numerical drift in the fused train step."""
    results = []
    for _ in range(2):
        tr, loader = _trainer(tmp_path, header="GOLD", max_iter=2)
        loader._rng = np.random.default_rng(1)  # reset loader shuffling
        tr.train(train_loader=loader)
        results.append((tr.f, tr.rho))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-4)


def test_legacy_train2_vae_and_test(tmp_path):
    """train2 VAE loop + standalone sigmoid test (dcnn.py:453-487,
    548-579)."""
    from optwboundeigenval_tpu.models.vae import VAE
    from optwboundeigenval_tpu.models.mlp_forest import ForestNet as Enc
    from optwboundeigenval_tpu.optim import sgd as make_sgd
    from optwboundeigenval_tpu.train import Task, legacy

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 12)).astype(np.float32)
    y = (rng.random(size=(64, 4)) > 0.5).astype(np.float32)
    loader = ArrayLoader(x, y, 32)

    model = VAE(encoder=Enc(hidden=8, num_classes=8), znum=6, hnum=8,
                outnum=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        jnp.asarray(x[:32]), train=True,
    )
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    opt = make_sgd(0.05)
    opt_state = opt.init(params)
    losses = []
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        params, ms, opt_state, avg = legacy.train2_epoch(
            model, params, ms, opt, opt_state, loader, key
        )
        losses.append(avg)
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]

    # standalone legacy test(): per-class ROC-AUC on sigmoid outputs
    class _Wrap:
        """Minimal task-like facade: predict -> recon logits."""

        @staticmethod
        def predict(p, m, batch):
            out, _, _ = model.apply({"params": p, **m}, batch["x"],
                                    train=False)
            return out

    roc, avgroc, (labels, outputs) = legacy.test(_Wrap, params, ms, loader)
    assert roc.shape == (4,)
    assert 0.0 <= avgroc <= 1.0
    assert labels.shape == outputs.shape == (64, 4)


def test_run_cmd_pipe_pty_and_errors():
    """cmd.py surface parity (reference cmd.py:28-89): capture, pty
    tty-ness, CR-overwrite collapse, CalledProcessError w/ output."""
    import pytest
    import sys

    from optwboundeigenval_tpu.utils.cmd import run_cmd

    # plain pipe capture
    out = run_cmd([sys.executable, "-c", "print('hello')"], silent=True)
    assert out == "hello\n"

    # the child sees a tty under use_pty
    out = run_cmd(
        [sys.executable, "-c", "import sys; print(sys.stdout.isatty())"],
        use_pty=True, silent=True,
    )
    assert out.strip() == "True"

    # carriage-return progress overwrites collapse to the final state
    out = run_cmd(
        [sys.executable, "-c",
         r"import sys; sys.stdout.write('10%\r50%\rdone\n')"],
        silent=True,
    )
    assert out == "done\n"

    # non-zero exit raises with the captured output attached
    with pytest.raises(Exception) as ei:
        run_cmd([sys.executable, "-c",
                 "print('boom'); raise SystemExit(3)"], silent=True)
    assert ei.value.returncode == 3
    assert "boom" in ei.value.output


def test_git_helpers(tmp_path):
    """git_pull/git_push against local fixture repos (cmd.py:13-26)."""
    import subprocess

    from optwboundeigenval_tpu.utils.cmd import git_pull, git_push

    def git(*args, cwd):
        subprocess.run(["git", *args], cwd=cwd, check=True,
                       capture_output=True)

    upstream = tmp_path / "upstream.git"
    upstream.mkdir()
    git("init", "--bare", "-b", "main", str(upstream), cwd=tmp_path)
    clone_a = tmp_path / "a"
    git("clone", str(upstream), str(clone_a), cwd=tmp_path)
    git("config", "user.email", "t@t", cwd=clone_a)
    git("config", "user.name", "t", cwd=clone_a)
    (clone_a / "f.txt").write_text("one\n")
    git("add", "f.txt", cwd=clone_a)
    git("commit", "-m", "one", cwd=clone_a)
    git("push", "origin", "main", cwd=clone_a)

    clone_b = tmp_path / "b"
    git("clone", str(upstream), str(clone_b), cwd=tmp_path)
    git("config", "user.email", "t@t", cwd=clone_b)
    git("config", "user.name", "t", cwd=clone_b)

    # nothing new: git_pull returns False ("up to date")
    assert git_pull(cwd=str(clone_b)) is False

    # push a new commit from a; git_pull in b now reports updates
    (clone_a / "f.txt").write_text("two\n")
    git("commit", "-am", "two", cwd=clone_a)
    git("push", cwd=clone_a)
    assert git_pull(cwd=str(clone_b)) is True

    # git_push pushes b's commit upstream
    (clone_b / "g.txt").write_text("b\n")
    git("add", "g.txt", cwd=clone_b)
    git("commit", "-m", "from b", cwd=clone_b)
    git_push(cwd=str(clone_b))
    log = subprocess.run(
        ["git", "log", "--oneline", "main"], cwd=upstream,
        capture_output=True, text=True, check=True,
    ).stdout
    assert "from b" in log


class _PinnedEpochRng:
    """Epoch-end random-batch draw pinned to a call counter so a
    resumed trainer continues the straight-through draw sequence."""

    def __init__(self, start=0):
        self.i = start

    def integers(self, low, high):
        v = low + self.i % max(high - low, 1)
        self.i += 1
        return v


def test_resume_preserves_cov_stop_window(tmp_path):
    """The CoV early stop (opt.py:841-845) evaluates the last-10 h
    values; save_full/resume checkpoints that window, so a mid-run
    resume stops at the SAME epoch a straight-through run does.
    Without the checkpointed window the resumed run restarts h_hist
    empty: at min_iter-1 it has <2 entries, the stop check is skipped,
    and the run trains past the straight-through stop epoch."""
    kw = dict(min_iter=4, max_iter=10, eps=0.5)
    trA, loaderA = _trainer(tmp_path, header="COVA", **kw)
    trA._np_rng = _PinnedEpochRng()
    trA.train(train_loader=loaderA)
    stop_epoch = trA.i
    assert stop_epoch < 9, "CoV stop never fired; eps too tight for test"

    # interrupted run: 2 epochs, checkpoint, then a FRESH trainer resumes
    trB, loaderB = _trainer(tmp_path, header="COVB",
                            min_iter=4, max_iter=2, eps=0.5)
    trB._np_rng = _PinnedEpochRng()
    trB.train(train_loader=loaderB)
    trB.save_full()

    trC, _ = _trainer(tmp_path, header="COVB", **kw)
    trC.init_state(next(iter(loaderB)))
    trC.resume()
    trC._np_rng = _PinnedEpochRng(start=2)
    trC.train(train_loader=loaderB)
    assert trC.i == stop_epoch


def test_parity_anchor_alignment(tmp_path):
    """f64-anchor row alignment (benchmarks/parity/run_parity.py
    load_anchor): the reference dumps nb+1 states per epoch (per-batch
    comp_g + the pinned epoch-end comp_g, opt.py:618/:740) while the
    jax side dumps nb (its epoch-end rho runs through a separate jitted
    path) — batch row k of epoch e must map to jax dump e*nb+k and ref
    dump e*(nb+1)+k."""
    import json

    from benchmarks.parity import run_parity

    epochs, nb = 2, 3
    # jax own: value encodes (epoch, batch-slot) as e*100+k
    j_own = [e * 100 + k for e in range(epochs) for k in range(nb)]
    # ref-order series (nb+1 per epoch): batch slots then epoch-end 99
    t_own = [e * 100 + k for e in range(epochs)
             for k in list(range(nb)) + [99]]
    j_at_ref = [v + 0.5 for v in t_own]
    with open(tmp_path / "anchor_jax.json", "w") as fh:
        json.dump({"rho_j64_own": j_own, "rho_j64_at_ref": j_at_ref}, fh)
    with open(tmp_path / "anchor_torch.json", "w") as fh:
        json.dump({"rho_t64_own": t_own}, fh)

    orig = run_parity.CONFIGS
    run_parity.CONFIGS = dict(orig, mini={"f64_anchor": True,
                                          "epochs": epochs})
    try:
        rows = run_parity.load_anchor("mini", str(tmp_path))
    finally:
        run_parity.CONFIGS = orig
    assert len(rows) == epochs * nb
    for e in range(epochs):
        for k in range(nb):
            r = rows[e * nb + k]
            assert r["j64_own"] == e * 100 + k
            assert r["t64_own"] == e * 100 + k  # epoch-end rows skipped
            assert r["j64_at_ref"] == e * 100 + k + 0.5


def _synth_metrics(batch_rhos, acc=0.5):
    """Minimal compare()-shaped metrics dict: one epoch whose rho is
    the last batch rho, verbose rows [step, rho]."""
    return {
        "epochs": [{"epoch": 0, "f": 1.0, "rho": batch_rhos[-1]}],
        "train_acc": acc, "test_acc": acc, "wall_time_s": 1.0,
        "platform": "cpu", "param_drift_rel": None,
        "batch_rows": [[i, r] for i, r in enumerate(batch_rhos)],
    }


def test_parity_anchored_verdict():
    """compare()'s per-batch f64-anchored branch (run_parity.py): when
    anchor rows align, the verdict must be B1 (cross-framework f64
    parity at the reference's visited states, ≤1e-3 med / ≤1e-2 max)
    AND B2 (f32 self-deviation symmetric within 10x) — with NO chaos
    envelope — even when the raw f32 matched-batch gap alone would
    fail the plain ≤1e-3 criterion."""
    from benchmarks.parity import run_parity

    cfg = {"epochs": 1, "batch_size": 4, "mu": 0.01, "K": 0.0,
           "n_train": 16, "f64_anchor": True, "acc_bound_pp": 2.0}
    # f32 rho gap ~20% — fails the plain criterion on its own
    ref = _synth_metrics([100.0, 110.0, 120.0, 130.0])
    jx = _synth_metrics([120.0, 95.0, 140.0, 118.0])

    def anchor(b1_err, dj_scale):
        rows = []
        for rb, jb in zip(ref["batch_rows"], jx["batch_rows"]):
            t64 = rb[1] * 1.001          # ref's own f64 oracle
            rows.append({
                "t64_own": t64,
                "j64_at_ref": t64 * (1 + b1_err),   # B1 gap
                "j64_own": jb[1] * (1 + dj_scale),  # sets d_j
            })
        return rows

    # PASS: B1 tight (1e-5), self-deviations comparable
    sec, ok = run_parity.compare("anch", cfg, ref, jx,
                                 anchor=anchor(1e-5, 1e-3))
    assert ok and "f64-anchored" in sec and "NO chaos envelope" in sec
    # FAIL on B1: cross-framework f64 gap 5% at every visited state
    _, ok = run_parity.compare("anch", cfg, ref, jx,
                               anchor=anchor(5e-2, 1e-3))
    assert not ok
    # misaligned anchor (wrong row count) must NOT activate the
    # anchored branch: plain criteria apply and the 20% f32 gap fails
    sec, ok = run_parity.compare("anch", cfg, ref, jx,
                                 anchor=anchor(1e-5, 1e-3)[:-1])
    assert not ok and "f64-anchored" not in sec
