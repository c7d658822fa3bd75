"""Covariate-shift robustness evaluation.

Capability parity with the reference's importance-weighted testing:

  * ``get_prob`` — per-feature (skew-)normal log-densities summed over
    features, with inf-logpdf rows patched to the normal logpdf
    (opt.py:1858-1880);
  * ``test_model_cov`` — importance weights
    ``exp(log p_test(x) − log p_train(x))`` restricted to the shifted
    feature modes, weight-normalized accuracy/F1, min/max weights
    (opt.py:1095-1174);
  * ``cov_shift_tester`` — ``iters`` random shift draws
    ``indices ~ mult·N(0,1)`` over non-excluded modes applied to
    mean/sd/skew, evaluated across a list of models, CSV outputs
    (opt.py:1890-1936, appending mode opt.py:1883-1887);
  * plots + slope comparison — matplotlib/scipy replacements for
    ``cov_shift_plots.R`` (acc/F1 vs L1-shift-norm scatter with linear
    trendlines and zero-shift baselines) and ``cov_shift_acc_comp.R``
    (trend-slope significance comparison).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from scipy.stats import norm, skewnorm

from optwboundeigenval_tpu.data.loaders import ArrayLoader


def _broadcast(m, sd, skew):
    m, sd, skew = list(m), list(sd), list(skew)
    n = max(len(m), len(sd), len(skew))
    if len(m) == 1:
        m = m * n
    if len(sd) == 1:
        sd = sd * n
    if len(skew) == 1:
        skew = skew * n
    return np.asarray(m, float), np.asarray(sd, float), np.asarray(skew, float)


def get_prob(inputs: np.ndarray, m=(0,), sd=(1,), skew=(0,)) -> np.ndarray:
    """Row-wise log density under independent per-feature (skew-)normal
    marginals (opt.py:1858-1880)."""
    inputs = np.asarray(inputs, float)
    m, sd, skew = _broadcast(m, sd, skew)
    if not np.any(skew):
        w = norm.logpdf(inputs, m, sd)
    else:
        w = skewnorm.logpdf(inputs, skew, m, sd)
        bad = np.where(np.isinf(w))[0]
        if len(bad) > 0:
            w[bad] = norm.logpdf(inputs[bad, :], m, sd)
    return np.sum(w, axis=1)


def test_model_cov(
    trainer,
    x: np.ndarray,
    y: np.ndarray,
    test_mean=(0,),
    test_sd=(1,),
    test_skew=(0,),
    train_mean=(0,),
    train_sd=(1,),
    train_skew=(0,),
):
    """Importance-weighted loss/accuracy/F1 (opt.py:1095-1174).
    Returns (loss, acc, f1, min_weight, max_weight)."""
    from sklearn.metrics import f1_score

    feats = x.shape[1]
    tm, tsd, tsk = _broadcast(list(test_mean) * (feats if len(test_mean) == 1 else 1),
                              list(test_sd) * (feats if len(test_sd) == 1 else 1),
                              list(test_skew) * (feats if len(test_skew) == 1 else 1))
    rm, rsd, rsk = _broadcast(list(train_mean) * (feats if len(train_mean) == 1 else 1),
                              list(train_sd) * (feats if len(train_sd) == 1 else 1),
                              list(train_skew) * (feats if len(train_skew) == 1 else 1))
    modes = np.where(
        np.logical_or.reduce([tm - rm != 0, tsd - rsd != 0, tsk - rsk != 0])
    )[0]

    loader = ArrayLoader(x, y, trainer.batch_size)
    eval_step = trainer._get("eval_step", trainer._build_eval_step)

    f_list, acc_list, f1_list, sizes, wm_list = [], [], [], [], []
    min_weight, max_weight = 1.0, 1.0
    for data in loader:
        batch = trainer._put_batch(data)
        loss, ops = eval_step(trainer.params, trainer.model_state, batch)
        w_mask = np.asarray(data["w"])
        nreal = int(np.sum(w_mask > 0))
        ops = np.asarray(ops)[:nreal]
        target = np.asarray(data["y"])[:nreal]
        inputs = np.asarray(data["x"])[:nreal]

        predicted = np.argmax(ops, axis=1)
        if len(modes) > 0:
            w = np.exp(
                get_prob(inputs[:, modes], tm[modes], tsd[modes], tsk[modes])
                - get_prob(inputs[:, modes], rm[modes], rsd[modes], rsk[modes])
            )
        else:
            w = np.ones(nreal)
        wm = float(np.mean(w))
        wm_list.append(wm)
        # reference quirk preserved (opt.py:1152-1153): min/max track
        # np.min(wm)/np.max(wm) of the SCALAR batch mean — i.e. the
        # extreme per-batch MEAN weight seeded at 1, not the extreme
        # per-example weight the variable names suggest
        min_weight = min(min_weight, wm)
        max_weight = max(max_weight, wm)
        weights = w / (wm * nreal)
        acc = float(np.sum(weights * (predicted == target))) * 100
        f_list.append(float(loss))
        acc_list.append(acc)
        f1_list.append(
            f1_score(target, predicted, average="micro", sample_weight=weights)
        )
        sizes.append(nreal)

    test_loss = float(np.average(f_list, weights=sizes))
    acc_w = np.asarray(sizes, float) * np.asarray(wm_list)
    acc_w = acc_w / np.sum(acc_w)
    return (
        test_loss,
        float(np.average(acc_list, weights=acc_w)),
        float(np.average(f1_list, weights=acc_w)),
        min_weight,
        max_weight,
    )


def test_model_best_cov(trainer, x, y, **kw):
    """Load the best checkpoint then evaluate under shift
    (opt.py:1176-1183)."""
    trainer.model_load()
    return test_model_cov(trainer, x, y, **kw)


def _append_file(fn: str, arr: np.ndarray) -> None:
    with open(fn, "ab") as f:
        f.write(b"\n")
        np.savetxt(f, arr, delimiter=",")


def cov_shift_tester(
    models: Sequence,
    x: np.ndarray,
    y: np.ndarray,
    iters: int = 1000,
    bad_modes: Sequence[int] = (),
    header: str = "",
    mult: float = 0.1,
    mean_diff: float = 0.0,
    sd_diff: float = 0.0,
    skew_diff: float = 0.0,
    test_mean=(0,),
    test_sd=(1,),
    test_skew=(0,),
    train_mean=(0,),
    train_sd=(1,),
    train_skew=(0,),
    indices: Optional[str] = None,
    append: bool = False,
    log_dir: str = "./logs",
    seed: Optional[int] = None,
):
    """Random-shift sweep across models (opt.py:1890-1936): draws
    ``indices ~ mult*N(0,1)`` on non-excluded feature modes, applies
    them to the test mean/sd/skew, evaluates every model's best
    checkpoint importance-weighted, and writes acc/f1/indices CSVs."""
    os.makedirs(log_dir, exist_ok=True)
    feats = x.shape[1]
    good_modes = np.setdiff1d(np.arange(feats), np.asarray(bad_modes, int))

    test_mean = list(test_mean) * (feats if len(test_mean) == 1 else 1)
    test_sd = list(test_sd) * (feats if len(test_sd) == 1 else 1)
    test_skew = list(test_skew) * (feats if len(test_skew) == 1 else 1)

    nmod = len(models)
    acc = np.zeros((nmod, iters))
    f1 = np.zeros((nmod, iters))
    if indices is None:
        rng = np.random.default_rng(seed)
        idx = np.zeros((feats, iters))
        idx[good_modes, :] = mult * rng.normal(size=(len(good_modes), iters))
    else:
        idx = np.genfromtxt(indices, delimiter=",")

    for i in range(iters):
        mean = np.asarray(test_mean) + idx[:, i] * mean_diff
        sd = np.asarray(test_sd) + idx[:, i] * sd_diff
        skew = np.asarray(test_skew) + idx[:, i] * skew_diff
        for j, model in enumerate(models):
            _, acc[j, i], f1[j, i], _, _ = test_model_best_cov(
                model, x, y,
                test_mean=mean, test_sd=sd, test_skew=skew,
                train_mean=train_mean, train_sd=train_sd,
                train_skew=train_skew,
            )

    if append:
        _append_file(os.path.join(log_dir, header + "_cov_shift_acc.csv"), acc)
        _append_file(os.path.join(log_dir, header + "_cov_shift_f1.csv"), f1)
    else:
        np.savetxt(os.path.join(log_dir, header + "_cov_shift_acc.csv"), acc,
                   delimiter=",")
        np.savetxt(os.path.join(log_dir, header + "_cov_shift_f1.csv"), f1,
                   delimiter=",")
        np.savetxt(
            os.path.join(log_dir, header + "_cov_shift_indices.csv"), idx,
            delimiter=",",
        )
    return acc, f1, idx


def cov_shift_plots(
    acc: np.ndarray,
    indices: np.ndarray,
    labels: Sequence[str],
    baselines: Optional[Sequence[float]] = None,
    out_path: str = "./plots/cov_shift_acc.png",
):
    """Matplotlib replacement for cov_shift_plots.R: per-model accuracy
    vs L1 norm of the shift with linear trendlines and zero-shift
    baseline hlines (cov_shift_plots.R:13-41)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    shift_norm = np.sum(np.abs(indices), axis=0)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    for j, label in enumerate(labels):
        col = f"C{j}"
        ax.scatter(shift_norm, acc[j], s=6, alpha=0.4, color=col, label=label)
        coef = np.polyfit(shift_norm, acc[j], 1)
        xs = np.linspace(shift_norm.min(), shift_norm.max(), 50)
        ax.plot(xs, np.polyval(coef, xs), color=col)
        if baselines is not None:
            ax.axhline(baselines[j], color=col, linestyle=":", alpha=0.7)
    ax.set_xlabel("L1 norm of covariate shift")
    ax.set_ylabel("importance-weighted accuracy (%)")
    ax.legend(fontsize=7)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def slope_comparison(acc: np.ndarray, indices: np.ndarray,
                     labels: Sequence[str]):
    """cov_shift_acc_comp.R replacement: per-model regression slope of
    accuracy on shift norm with standard errors, plus pairwise z-tests
    for slope differences (cov_shift_acc_comp.R:23-28)."""
    from scipy import stats

    shift_norm = np.sum(np.abs(indices), axis=0)
    rows = []
    for j, label in enumerate(labels):
        res = stats.linregress(shift_norm, acc[j])
        rows.append(
            {"model": label, "slope": res.slope, "stderr": res.stderr,
             "pvalue": res.pvalue}
        )
    comps = []
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            dz = (rows[a]["slope"] - rows[b]["slope"]) / np.sqrt(
                rows[a]["stderr"] ** 2 + rows[b]["stderr"] ** 2
            )
            p = 2 * (1 - stats.norm.cdf(abs(dz)))
            comps.append(
                {"a": rows[a]["model"], "b": rows[b]["model"], "z": dz, "p": p}
            )
    return rows, comps
