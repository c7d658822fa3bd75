"""Covariate-shift robustness driver — reference ``cov_shift_test.py``
equivalent.

Builds the Forest CoverType model variants (spectral-reg grid +
comparators, cov_shift_test.py:36-141), loads each one's best
checkpoint, and sweeps random covariate shifts with
``cov_shift_tester`` (1000 draws by default), writing
``<header>_cov_shift_{acc,f1,indices}.csv`` plus the scatter/trendline
plot and slope comparison (replacing cov_shift_plots.R /
cov_shift_acc_comp.R).

Usage:
    python scripts/cov_shift_test.py [iters] [mult]

Models are discovered by their checkpoint files under ./models; train
them first with the forest_* configs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(iters: int = 1000, mult: float = 0.1):
    from optwboundeigenval_tpu.analysis import cov_shift
    from optwboundeigenval_tpu.data import forest
    from optwboundeigenval_tpu.models import ForestNet
    from optwboundeigenval_tpu.optim import sgd
    from optwboundeigenval_tpu.train import SpectralTrainer, Task

    data = forest.get_data()
    x, y = data["inputs_test"], data["target_test"]

    # the model grid of cov_shift_test.py:36-141 (mu/K variants +
    # unregularized control); comparators join when their checkpoints
    # exist
    variants = [
        ("Forest", dict(mu=0.01, K=1.0)),
        ("Forest", dict(mu=0.01, K=0.0)),
        ("Forest", dict(mu=0.001, K=5.0)),
        ("Forest", dict(mu=0.001, K=0.0)),
        ("Forest", dict(mu=0.005, K=1.0)),
        ("Forest", dict(mu=0.0028, K=1.0)),
        ("Forest", dict(mu=0.0, K=0.0)),
    ]
    models, labels = [], []
    for header, kw in variants:
        tr = SpectralTrainer(
            Task(model=ForestNet()), sgd(0.5), header=header,
            batch_size=128, **kw,
        )
        ckpt = os.path.join(
            "./models", tr.header2 + "_trained_model_best.msgpack"
        )
        if not os.path.exists(ckpt):
            continue
        tr.init_state(
            {"x": x[:128], "y": y[:128], "w": np.ones(128, np.float32)}
        )
        models.append(tr)
        labels.append(f"mu={kw['mu']} K={kw['K']}")
    if not models:
        print("No trained Forest checkpoints found under ./models — "
              "train forest_* configs first.")
        return

    # binary soil/wilderness indicator columns are excluded from
    # shifting (the reference's bad_modes usage)
    bad_modes = list(range(10, x.shape[1]))
    acc, f1, idx = cov_shift.cov_shift_tester(
        models, x, y, iters=iters, mult=mult, mean_diff=1.0,
        bad_modes=bad_modes, header="Forest",
    )
    baselines = [float(a.mean()) for a in acc]
    cov_shift.cov_shift_plots(acc, idx, labels, baselines=baselines)
    rows, comps = cov_shift.slope_comparison(acc, idx, labels)
    for r in rows:
        print(f"{r['model']}: slope={r['slope']:.4f} +- {r['stderr']:.4f}")
    for c in comps:
        print(f"{c['a']} vs {c['b']}: z={c['z']:.2f} p={c['p']:.4f}")


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    main(iters, mult)
